"""WARC/1.0 (Web ARChive, ISO 28500) record codec, spec-level.

WARC is the container format of web-crawl corpora (Common Crawl et
al.) — the single most common raw input of an LLM training-data
pipeline. No WARC library ships in this sandbox, so — same approach
as operators/avroio.py and operators/multimodal.py — the PUBLIC
record grammar is implemented byte-level:

    record  = "WARC/1.0" CRLF *named-field CRLF block CRLF CRLF
    field   = name ":" SP value CRLF
    block   = Content-Length octets (for response records: an
              HTTP/1.1 message, itself headers CRLF CRLF body)

Writers emit ``WARC-Payload-Digest: sha1:<base32>`` over the HTTP
body exactly as crawlers do; the parser recomputes and verifies it,
so corrupt payload slicing is detected rather than propagated.

Records are independent and length-prefixed, so a 100 TB corpus
splits by FILE (one .warc per task via the binaryFile source) — the
same parallelism story real crawl processing uses (Common Crawl
ships ~1 GB .warc.gz segments for exactly this reason).
"""

from __future__ import annotations

import base64
import hashlib

CRLF = "\r\n"


def _sha1_b32(payload: bytes) -> str:
    return base64.b32encode(hashlib.sha1(payload).digest()).decode()


def build_response_record(uri: str, record_id: str, date: str, html: str) -> bytes:
    """One WARC response record wrapping an HTTP/1.1 200 message."""
    body = html.encode("utf-8")
    http = (
        f"HTTP/1.1 200 OK{CRLF}"
        f"Content-Type: text/html; charset=utf-8{CRLF}"
        f"Content-Length: {len(body)}{CRLF}{CRLF}"
    ).encode("ascii") + body
    head = (
        f"WARC/1.0{CRLF}"
        f"WARC-Type: response{CRLF}"
        f"WARC-Record-ID: <{record_id}>{CRLF}"
        f"WARC-Date: {date}{CRLF}"
        f"WARC-Target-URI: {uri}{CRLF}"
        f"WARC-Payload-Digest: sha1:{_sha1_b32(body)}{CRLF}"
        f"Content-Type: application/http; msgtype=response{CRLF}"
        f"Content-Length: {len(http)}{CRLF}{CRLF}"
    ).encode("ascii")
    return head + http + (CRLF + CRLF).encode("ascii")


def parse_warc(data: bytes) -> list[dict]:
    """Parse a concatenation of WARC records -> one dict per record:
    warc headers (lowercased names), ``http_status``, ``body`` bytes,
    and ``digest_ok`` (recomputed sha1 vs WARC-Payload-Digest).
    Non-response records (warcinfo, request, ...) are returned with
    body=None so callers can filter by ``warc-type``."""
    out: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos : pos + 2] == b"\r\n":  # inter-record padding
            pos += 2
            continue
        head_end = data.index(b"\r\n\r\n", pos)
        head_lines = data[pos:head_end].decode("utf-8").split(CRLF)
        if not head_lines[0].startswith("WARC/"):
            raise ValueError(f"bad WARC version line at {pos}: {head_lines[0]!r}")
        hdr: dict[str, str] = {}
        for line in head_lines[1:]:
            k, _, v = line.partition(":")
            hdr[k.strip().lower()] = v.strip()
        clen = int(hdr["content-length"])
        block = data[head_end + 4 : head_end + 4 + clen]
        pos = head_end + 4 + clen
        rec: dict = dict(hdr)
        rec["http_status"] = None
        rec["body"] = None
        rec["digest_ok"] = None
        if hdr.get("warc-type") == "response" and block.startswith(b"HTTP/"):
            http_head_end = block.index(b"\r\n\r\n")
            status_line = block[:http_head_end].split(b"\r\n", 1)[0].decode("ascii")
            rec["http_status"] = int(status_line.split(" ")[1])
            rec["body"] = block[http_head_end + 4 :]
            want = hdr.get("warc-payload-digest", "")
            if want.startswith("sha1:"):
                rec["digest_ok"] = _sha1_b32(rec["body"]) == want[5:]
        out.append(rec)
    return out
