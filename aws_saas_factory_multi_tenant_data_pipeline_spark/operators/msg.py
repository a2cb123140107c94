"""Outlook .msg extraction — corporate mail exports and e-discovery
dumps ship single messages as .msg (a CFB container of MAPI property
streams), and they appear in crawls wherever mail archives do.

Implemented from the PUBLIC [MS-OXMSG] specification over the CFB
walk (operators/cfb.py): variable-length properties live in streams
named ``__substg1.0_XXXXTTTT`` — XXXX the MAPI property id, TTTT the
type (001F UTF-16LE string, 001E 8-bit string, 0102 binary) — with
the ids this pipeline needs: 0037 subject, 0C1A sender display name,
0C1F sender address, 0E04 display-to, 1000 plain body, 1013 HTML body
(binary). Recipients sit in ``__recip_version1.0_#NNNNNNNN`` storages
(3001 display name, 39FE SMTP address), attachments in
``__attach_version1.0_#NNNNNNNN`` storages (3704/3707 file names,
3701 either the attachment BYTES at type 0102 or, at type 000D, a
NESTED ``__substg1.0_3701000D`` STORAGE holding a full embedded
message — parsed recursively). The fixed-width ``__properties_
version1.0`` stream and the string-codepage property are named
boundaries (8-bit strings decode cp1252, the format's default).

No host .msg artifact or reader exists (the CFB tripwire in
tests/test_realworld_r15.py globs .msg too); the fixture writer
builds spec-literal containers with multi-recipient, attachment, and
nested-message shapes over build_cfb.

Reference parity: the reference lake's schema-on-read ingest
(src/main/cdk/ingestion/lib/glue-stack/glue-stack.ts:32-44). Tear
contract: ValueError — and only ValueError."""

from __future__ import annotations

import re

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.cfb import (
    build_cfb,
    parse_cfb,
)

_PID_SUBJECT = "0037"
_PID_SENDER_NAME = "0C1A"
_PID_SENDER_ADDR = "0C1F"
_PID_DISPLAY_TO = "0E04"
_PID_BODY = "1000"
_PID_HTML = "1013"
_PID_RECIP_NAME = "3001"
_PID_RECIP_SMTP = "39FE"
_PID_ATTACH_NAME = "3704"
_PID_ATTACH_LONGNAME = "3707"
_PID_ATTACH_DATA = "3701"

_SUBSTG = re.compile(r"__substg1\.0_([0-9A-F]{4})([0-9A-F]{4})$")


def _decode_prop(raw: bytes, ptype: str) -> object:
    if ptype == "001F":
        return raw.decode("utf-16-le")
    if ptype == "001E":
        return raw.decode("cp1252", errors="replace")
    if ptype == "0102":
        return raw
    raise ValueError("msg: unsupported property type %s" % ptype)


def _props_at(streams: dict[str, bytes], prefix: str) -> dict:
    """Collect __substg properties directly under one storage level."""
    out: dict[str, object] = {}
    for name, raw in streams.items():
        if not name.startswith(prefix):
            continue
        rest = name[len(prefix):]
        if "/" in rest:
            continue  # deeper storage: someone else's property
        m = _SUBSTG.match(rest)
        if not m:
            continue
        pid, ptype = m.group(1), m.group(2)
        try:
            out[pid] = _decode_prop(raw, ptype)
        except UnicodeDecodeError as e:
            raise ValueError("msg: undecodable property %s" % pid) \
                from e
    return out


def _parse_level(streams: dict[str, bytes], prefix: str,
                 depth: int) -> dict:
    if depth > 8:
        raise ValueError("msg: absurd message nesting")
    props = _props_at(streams, prefix)
    subject = props.get(_PID_SUBJECT)
    if subject is None and depth == 0:
        raise ValueError("msg: no subject property (not a message?)")

    # recipients / attachments: storages at this level
    recip_names = sorted({
        name[len(prefix):].split("/")[0]
        for name in streams
        if name.startswith(prefix + "__recip_version1.0_#")
    })
    recipients = []
    for rn in recip_names:
        rp = _props_at(streams, prefix + rn + "/")
        recipients.append({
            "name": rp.get(_PID_RECIP_NAME),
            "smtp": rp.get(_PID_RECIP_SMTP),
        })

    attach_names = sorted({
        name[len(prefix):].split("/")[0]
        for name in streams
        if name.startswith(prefix + "__attach_version1.0_#")
    })
    attachments = []
    nested = []
    for an in attach_names:
        ap = _props_at(streams, prefix + an + "/")
        sub_prefix = (prefix + an + "/__substg1.0_" +
                      _PID_ATTACH_DATA + "000D/")
        if any(n.startswith(sub_prefix) for n in streams):
            nested.append(_parse_level(streams, sub_prefix,
                                       depth + 1))
            continue
        data = ap.get(_PID_ATTACH_DATA)
        if not isinstance(data, (bytes, type(None))):
            raise ValueError("msg: attachment data wrong type")
        attachments.append({
            "filename": ap.get(_PID_ATTACH_LONGNAME)
            or ap.get(_PID_ATTACH_NAME),
            "data": data if data is not None else b"",
        })

    html = props.get(_PID_HTML)
    return {
        "subject": subject or "",
        "sender_name": props.get(_PID_SENDER_NAME),
        "sender_addr": props.get(_PID_SENDER_ADDR),
        "to": props.get(_PID_DISPLAY_TO),
        "body": props.get(_PID_BODY) or "",
        "html": html if isinstance(html, bytes) else None,
        "recipients": recipients,
        "attachments": attachments,
        "attached_messages": nested,
    }


def parse_msg(data: bytes) -> dict:
    """Extract an Outlook .msg: subject/sender/to/body, recipient and
    attachment tables, embedded messages recursively."""
    cfb = parse_cfb(data)
    return _parse_level(cfb["streams"], "", 0)


# --- fixture writer --------------------------------------------------------


def _substg(pid: str, value) -> tuple[str, bytes]:
    if isinstance(value, bytes):
        return "__substg1.0_%s0102" % pid, value
    return "__substg1.0_%s001F" % pid, value.encode("utf-16-le")


def build_msg(subject: str, body: str, sender: str = "s@example.com",
              recipients: list[tuple[str, str]] | None = None,
              attachments: list[tuple[str, bytes]] | None = None,
              attached_msg: dict | None = None,
              eightbit_body: bool = False) -> bytes:
    """Spec-literal .msg fixture: UTF-16 properties by default, an
    8-bit (001E, cp1252) body variant, recipient/attachment storages,
    and optionally one EMBEDDED message (type 000D storage) built
    from the same parameters recursively."""
    streams: dict[str, bytes] = {}

    def emit(prefix: str, subject: str, body: str, sender: str,
             recipients, attachments, attached, eightbit: bool):
        k, v = _substg(_PID_SUBJECT, subject)
        streams[prefix + k] = v
        if eightbit:
            streams[prefix + "__substg1.0_%s001E" % _PID_BODY] = \
                body.encode("cp1252")
        else:
            k, v = _substg(_PID_BODY, body)
            streams[prefix + k] = v
        k, v = _substg(_PID_SENDER_ADDR, sender)
        streams[prefix + k] = v
        k, v = _substg(_PID_SENDER_NAME, sender.split("@")[0])
        streams[prefix + k] = v
        if recipients:
            k, v = _substg(_PID_DISPLAY_TO,
                           "; ".join(n for n, _ in recipients))
            streams[prefix + k] = v
        for i, (name, smtp) in enumerate(recipients or []):
            rp = prefix + "__recip_version1.0_#%08X/" % i
            k, v = _substg(_PID_RECIP_NAME, name)
            streams[rp + k] = v
            k, v = _substg(_PID_RECIP_SMTP, smtp)
            streams[rp + k] = v
        for i, (fname, payload) in enumerate(attachments or []):
            ap = prefix + "__attach_version1.0_#%08X/" % i
            k, v = _substg(_PID_ATTACH_LONGNAME, fname)
            streams[ap + k] = v
            streams[ap + "__substg1.0_%s0102" % _PID_ATTACH_DATA] = \
                payload
        if attached is not None:
            ap = prefix + "__attach_version1.0_#%08X/" % len(
                attachments or [])
            sub = (ap + "__substg1.0_" + _PID_ATTACH_DATA + "000D/")
            emit(sub, attached["subject"], attached["body"],
                 attached.get("sender", "inner@example.com"),
                 attached.get("recipients"), attached.get(
                     "attachments"), None, False)

    emit("", subject, body, sender, recipients, attachments,
         attached_msg, eightbit_body)
    streams["__properties_version1.0"] = b"\x00" * 32
    return build_cfb(streams)
