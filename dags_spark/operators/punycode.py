"""Punycode (RFC 3492) encoder/decoder, implemented from the
specification's pseudocode (§6.1-6.3) — the bootstring transform
behind every IDN 'xn--' domain label.

Pure functions over str; used by queries.functions.fn_punycode via
Arrow-batched pandas UDFs, and certified bit-exact against the
INDEPENDENT CPython 'punycode' codec in
tests/test_round9_batch36.py (the same independent-implementation
discipline as the ADPCM-vs-audioop and PNG-vs-ImageIO keys).

Parameter block (RFC 3492 §5): base 36, tmin 1, tmax 26, skew 38,
damp 700, initial_bias 72, initial_n 0x80.
"""

from __future__ import annotations

_BASE = 36
_TMIN = 1
_TMAX = 26
_SKEW = 38
_DAMP = 700
_INITIAL_BIAS = 72
_INITIAL_N = 0x80
_DIGITS = "abcdefghijklmnopqrstuvwxyz0123456789"


def _adapt(delta: int, numpoints: int, firsttime: bool) -> int:
    """Bias adaptation, RFC 3492 §6.1."""
    delta = delta // _DAMP if firsttime else delta // 2
    delta += delta // numpoints
    k = 0
    while delta > ((_BASE - _TMIN) * _TMAX) // 2:
        delta //= _BASE - _TMIN
        k += _BASE
    return k + ((_BASE - _TMIN + 1) * delta) // (delta + _SKEW)


def punycode_encode(s: str) -> str:
    """RFC 3492 §6.3 encoding of an arbitrary unicode string."""
    cps = [ord(c) for c in s]
    out = [c for c in s if ord(c) < _INITIAL_N]
    b = h = len(out)
    if b:
        out.append("-")
    n, delta, bias = _INITIAL_N, 0, _INITIAL_BIAS
    while h < len(cps):
        m = min(cp for cp in cps if cp >= n)
        if m - n > (2**31 - 1 - delta) // (h + 1):
            raise ValueError("punycode: overflow")
        delta += (m - n) * (h + 1)
        n = m
        for cp in cps:
            if cp < n:
                delta += 1
                if delta == 2**31:
                    raise ValueError("punycode: overflow")
            elif cp == n:
                q = delta
                k = _BASE
                while True:
                    t = (
                        _TMIN
                        if k <= bias
                        else (_TMAX if k >= bias + _TMAX else k - bias)
                    )
                    if q < t:
                        break
                    out.append(_DIGITS[t + (q - t) % (_BASE - t)])
                    q = (q - t) // (_BASE - t)
                    k += _BASE
                out.append(_DIGITS[q])
                bias = _adapt(delta, h + 1, h == b)
                delta = 0
                h += 1
        delta += 1
        n += 1
    return "".join(out)


def punycode_decode(s: str) -> str:
    """RFC 3492 §6.2 decoding; loud ValueError on malformed input."""
    pos = s.rfind("-")
    if pos > 0:
        out = [ord(c) for c in s[:pos]]
        if any(cp >= _INITIAL_N for cp in out):
            raise ValueError("punycode: non-basic in literal portion")
        rest = s[pos + 1 :]
    else:
        out = []
        rest = s[pos + 1 :] if pos == 0 else s
    b = len(out)
    n, i, bias = _INITIAL_N, 0, _INITIAL_BIAS
    j = 0
    while j < len(rest):
        oldi = i
        w = 1
        k = _BASE
        while True:
            if j >= len(rest):
                raise ValueError("punycode: truncated variable-length int")
            ch = rest[j]
            j += 1
            if "a" <= ch <= "z":
                digit = ord(ch) - ord("a")
            elif "0" <= ch <= "9":
                digit = ord(ch) - ord("0") + 26
            elif "A" <= ch <= "Z":
                digit = ord(ch) - ord("A")
            else:
                raise ValueError(f"punycode: bad digit {ch!r}")
            if digit > (2**31 - 1 - i) // w:
                raise ValueError("punycode: overflow")
            i += digit * w
            t = (
                _TMIN
                if k <= bias
                else (_TMAX if k >= bias + _TMAX else k - bias)
            )
            if digit < t:
                break
            w *= _BASE - t
            k += _BASE
        bias = _adapt(i - oldi, len(out) + 1, oldi == 0)
        n += i // (len(out) + 1)
        i %= len(out) + 1
        out.insert(i, n)
        i += 1
        b = b  # literal portion length is fixed; kept for clarity
    return "".join(chr(cp) for cp in out)


def idn_encode_label(label: str) -> str:
    """IDNA surface rule: ASCII labels pass through; any non-ASCII
    label becomes 'xn--' + punycode."""
    if all(ord(c) < 0x80 for c in label):
        return label
    return "xn--" + punycode_encode(label)


def idn_decode_label(label: str) -> str:
    if label.startswith("xn--"):
        return punycode_decode(label[4:])
    return label
