"""Pure-Python Punycode (RFC 3492) + IDNA ACE labels — international
domains arrive in crawls as ``xn--`` ACE labels; blocklist matching,
homoglyph audits (q295), and host canonicalization (q251) all need the
Unicode form. Implemented from the RFC's parameter set; tests
cross-validate against CPython's built-in ``punycode`` codec (an
independent implementation of the same spec).
"""

from __future__ import annotations

BASE = 36
TMIN, TMAX = 1, 26
SKEW, DAMP = 38, 700
INITIAL_BIAS = 72
INITIAL_N = 128


def _adapt(delta: int, numpoints: int, firsttime: bool) -> int:
    delta = delta // DAMP if firsttime else delta // 2
    delta += delta // numpoints
    k = 0
    while delta > ((BASE - TMIN) * TMAX) // 2:
        delta //= BASE - TMIN
        k += BASE
    return k + (((BASE - TMIN + 1) * delta) // (delta + SKEW))


def _digit_to_char(d: int) -> str:
    return chr(d + 22 + 75 * (d < 26))  # a-z then 0-9


def _char_to_digit(c: str) -> int:
    if "a" <= c <= "z":
        return ord(c) - ord("a")
    if "A" <= c <= "Z":
        return ord(c) - ord("A")
    if "0" <= c <= "9":
        return ord(c) - ord("0") + 26
    raise ValueError(f"punycode: invalid digit {c!r}")


def punycode_encode(text: str) -> str:
    """RFC 3492 6.3 encoding (without the ACE prefix)."""
    basic = [c for c in text if ord(c) < 128]
    out = list(basic)
    if basic:
        out.append("-")
    h = b = len(basic)
    n, delta, bias = INITIAL_N, 0, INITIAL_BIAS
    codepoints = sorted({ord(c) for c in text if ord(c) >= 128})
    for m in codepoints:
        delta += (m - n) * (h + 1)
        n = m
        for c in text:
            cp = ord(c)
            if cp < n:
                delta += 1
                if delta == 0:
                    raise OverflowError("punycode delta overflow")
            elif cp == n:
                q = delta
                k = BASE
                while True:
                    t = (TMIN if k <= bias
                         else TMAX if k >= bias + TMAX else k - bias)
                    if q < t:
                        break
                    out.append(_digit_to_char(t + (q - t) % (BASE - t)))
                    q = (q - t) // (BASE - t)
                    k += BASE
                out.append(_digit_to_char(q))
                bias = _adapt(delta, h + 1, h == b)
                delta = 0
                h += 1
        delta += 1
        n += 1
    return "".join(out)


def punycode_decode(text: str) -> str:
    """RFC 3492 6.2 decoding (without the ACE prefix)."""
    pos = text.rfind("-")
    if pos > 0:
        output = list(text[:pos])
        if any(ord(c) >= 128 for c in output):
            raise ValueError("punycode: non-basic code point in "
                             "literal portion")
        encoded = text[pos + 1:]
    else:
        output = []
        encoded = text[1:] if pos == 0 else text
    n, i, bias = INITIAL_N, 0, INITIAL_BIAS
    idx = 0
    while idx < len(encoded):
        oldi = i
        w = 1
        k = BASE
        while True:
            if idx >= len(encoded):
                raise ValueError("punycode: truncated variable-length "
                                 "integer")
            digit = _char_to_digit(encoded[idx])
            idx += 1
            i += digit * w
            t = (TMIN if k <= bias
                 else TMAX if k >= bias + TMAX else k - bias)
            if digit < t:
                break
            w *= BASE - t
            k += BASE
        bias = _adapt(i - oldi, len(output) + 1, oldi == 0)
        n += i // (len(output) + 1)
        if n > 0x10FFFF:
            raise ValueError("punycode: code point out of range")
        i %= len(output) + 1
        output.insert(i, chr(n))
        i += 1
    return "".join(output)


def idna_decode_label(label: str) -> str:
    """One hostname label: ``xn--`` ACE forms decode, others pass."""
    if label.lower().startswith("xn--"):
        return punycode_decode(label[4:])
    return label


def idna_encode_label(label: str) -> str:
    if all(ord(c) < 128 for c in label):
        return label
    return "xn--" + punycode_encode(label)


def idna_decode_host(host: str) -> str:
    return ".".join(idna_decode_label(p) for p in host.split("."))


def idna_encode_host(host: str) -> str:
    return ".".join(idna_encode_label(p) for p in host.split("."))
