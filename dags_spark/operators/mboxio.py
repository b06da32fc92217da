"""mbox mailbox reader/writer (RFC 4155 framing + mboxrd quoting),
implemented from the public spec.

An mbox file is messages concatenated, each introduced by a
postmark line `From <sender> <asctime>` (the literal five bytes
"From " at column 0). The format's famous defect is that a BODY
line may itself start with "From " — so writers quote it. This
module implements the *mboxrd* convention (the only reversible
one): on write, any body line matching /^>*From / gains one more
leading '>'; on read, one '>' is stripped from such lines. The
naive mboxo convention ("From " -> ">From " only) is LOSSY — a
genuine ">From " line becomes indistinguishable — which is exactly
the corruption class the round-trip oracle would catch.

Messages are (headers, body) pairs; headers are an ordered list of
(name, value) with RFC 5322 continuation lines (leading whitespace)
folded back on read. Truncation/malformation (no postmark at start,
header line without ':') raises typed ValueError.
"""

from __future__ import annotations

import re

_POSTMARK = re.compile(r"^From (\S+) (.+)$")
_QUOTED_FROM = re.compile(r"^(>+)From ")


def write_mbox(messages: list[tuple[str, list[tuple[str, str]], str]]) -> bytes:
    """messages: (sender, headers, body). Returns the mbox bytes."""
    out = []
    for sender, headers, body in messages:
        out.append(f"From {sender} Thu Jan  1 00:00:00 1970")
        for name, value in headers:
            out.append(f"{name}: {value}")
        out.append("")
        for line in body.split("\n"):
            if line.startswith("From ") or _QUOTED_FROM.match(line):
                line = ">" + line
            out.append(line)
        out.append("")  # blank line terminates the message
    return ("\n".join(out) + "\n").encode("utf-8")


def read_mbox(blob: bytes) -> list[dict]:
    """Parse mbox bytes -> [{'sender', 'headers': [(k, v)], 'body'}]."""
    text = blob.decode("utf-8")
    lines = text.split("\n")
    if lines and lines[-1] == "":
        lines.pop()
    if not lines or not lines[0].startswith("From "):
        raise ValueError("mbox: missing initial postmark")
    msgs: list[dict] = []
    cur: dict | None = None
    in_headers = False
    body_lines: list[str] = []

    def _flush():
        if cur is not None:
            # the final blank separator is framing, not body
            b = body_lines[:-1] if body_lines and body_lines[-1] == "" else body_lines
            cur["body"] = "\n".join(b)
            msgs.append(cur)

    for line in lines:
        m = _POSTMARK.match(line)
        if m and (cur is None or (body_lines and body_lines[-1] == "")):
            _flush()
            cur = {"sender": m.group(1), "headers": []}
            in_headers = True
            body_lines = []
            continue
        if cur is None:
            raise ValueError("mbox: content before first postmark")
        if in_headers:
            if line == "":
                in_headers = False
                continue
            if line[:1] in (" ", "\t"):
                if not cur["headers"]:
                    raise ValueError("mbox: continuation before any header")
                k, v = cur["headers"][-1]
                cur["headers"][-1] = (k, v + " " + line.strip())
                continue
            if ":" not in line:
                raise ValueError(f"mbox: malformed header line {line!r}")
            k, v = line.split(":", 1)
            cur["headers"].append((k.strip(), v.strip()))
        else:
            qm = _QUOTED_FROM.match(line)
            if qm:
                line = line[1:]  # strip ONE level of mboxrd quoting
            body_lines.append(line)
    _flush()
    return msgs
