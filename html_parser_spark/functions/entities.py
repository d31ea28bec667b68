"""HTML entity codec with HTML::Entities semantics.

Re-implements, from scratch in Python, the behavior of the reference's
entity decoder (`/root/reference/util.c:64-273` ``decode_entities``) and
the public entity tables (`/root/reference/lib/HTML/Entities.pm:155-433`).
The tables are public ISO-8879 / HTML-3.2 / HTML-4 data.

Key semantics (verified against the reference tests
``t/entities.t``, ``t/entities2.t``, ``t/uentities.t``, ``t/dtext.t``):

* Table keys that carry a trailing ``;`` REQUIRE the terminating
  semicolon in the source text (`util.c:187-189`); keys without it may
  omit the semicolon.
* ``expand_prefix`` (the MSIE-compat mode used for the *dtext* path,
  `hparser.c:546`, but NOT for attribute values, `hparser.c:472`)
  falls back to the longest known prefix of an unknown entity name
  (`util.c:196-210`).
* Numeric entities: decimal and ``&#x`` hex; values > 0x10FFFF
  overflow and the entity is left intact (`util.c:97-128`); ``&#0``
  is left intact (`util.c:129`); 0xFFFE/0xFFFF are illegal and left
  intact (`util.c:137-139`); noncharacters U+FDD0..U+FDEF and
  ``*FFFE/*FFFF`` of higher planes become U+FFFD (`util.c:156-165`);
  adjacent high+low surrogate numeric entities combine into one
  supplementary char (`util.c:142-155`), adjacency broken by any
  non-``&`` char after the entity (`util.c:224-226`).
* One ``;`` is consumed after a successful replacement (`util.c:219`).
"""

from __future__ import annotations

import re

# --- entity tables (public data, Entities.pm:155-419) -------------------
# Keys WITHOUT ';' may appear without the terminating semicolon in HTML;
# keys WITH ';' require it.

_LATIN1 = {
    "amp": "&", "gt": ">", "lt": "<", "quot": '"', "apos": "'",
    "AElig": 198, "Aacute": 193, "Acirc": 194, "Agrave": 192,
    "Aring": 197, "Atilde": 195, "Auml": 196, "Ccedil": 199, "ETH": 208,
    "Eacute": 201, "Ecirc": 202, "Egrave": 200, "Euml": 203,
    "Iacute": 205, "Icirc": 206, "Igrave": 204, "Iuml": 207,
    "Ntilde": 209, "Oacute": 211, "Ocirc": 212, "Ograve": 210,
    "Oslash": 216, "Otilde": 213, "Ouml": 214, "THORN": 222,
    "Uacute": 218, "Ucirc": 219, "Ugrave": 217, "Uuml": 220,
    "Yacute": 221, "aacute": 225, "acirc": 226, "aelig": 230,
    "agrave": 224, "aring": 229, "atilde": 227, "auml": 228,
    "ccedil": 231, "eacute": 233, "ecirc": 234, "egrave": 232,
    "eth": 240, "euml": 235, "iacute": 237, "icirc": 238, "igrave": 236,
    "iuml": 239, "ntilde": 241, "oacute": 243, "ocirc": 244,
    "ograve": 242, "oslash": 248, "otilde": 245, "ouml": 246,
    "szlig": 223, "thorn": 254, "uacute": 250, "ucirc": 251,
    "ugrave": 249, "uuml": 252, "yacute": 253, "yuml": 255,
    "copy": 169, "reg": 174, "nbsp": 160,
    "iexcl": 161, "cent": 162, "pound": 163, "curren": 164, "yen": 165,
    "brvbar": 166, "sect": 167, "uml": 168, "ordf": 170, "laquo": 171,
    "not": 172, "shy": 173, "macr": 175, "deg": 176, "plusmn": 177,
    "sup1": 185, "sup2": 178, "sup3": 179, "acute": 180, "micro": 181,
    "para": 182, "middot": 183, "cedil": 184, "ordm": 186, "raquo": 187,
    "frac14": 188, "frac12": 189, "frac34": 190, "iquest": 191,
    "times": 215, "divide": 247,
}

_UNICODE = {  # keys require ';' (Entities.pm:265-418)
    "OElig": 338, "oelig": 339, "Scaron": 352, "scaron": 353,
    "Yuml": 376, "fnof": 402, "circ": 710, "tilde": 732,
    "Alpha": 913, "Beta": 914, "Gamma": 915, "Delta": 916,
    "Epsilon": 917, "Zeta": 918, "Eta": 919, "Theta": 920, "Iota": 921,
    "Kappa": 922, "Lambda": 923, "Mu": 924, "Nu": 925, "Xi": 926,
    "Omicron": 927, "Pi": 928, "Rho": 929, "Sigma": 931, "Tau": 932,
    "Upsilon": 933, "Phi": 934, "Chi": 935, "Psi": 936, "Omega": 937,
    "alpha": 945, "beta": 946, "gamma": 947, "delta": 948,
    "epsilon": 949, "zeta": 950, "eta": 951, "theta": 952, "iota": 953,
    "kappa": 954, "lambda": 955, "mu": 956, "nu": 957, "xi": 958,
    "omicron": 959, "pi": 960, "rho": 961, "sigmaf": 962, "sigma": 963,
    "tau": 964, "upsilon": 965, "phi": 966, "chi": 967, "psi": 968,
    "omega": 969, "thetasym": 977, "upsih": 978, "piv": 982,
    "ensp": 8194, "emsp": 8195, "thinsp": 8201, "zwnj": 8204,
    "zwj": 8205, "lrm": 8206, "rlm": 8207, "ndash": 8211, "mdash": 8212,
    "lsquo": 8216, "rsquo": 8217, "sbquo": 8218, "ldquo": 8220,
    "rdquo": 8221, "bdquo": 8222, "dagger": 8224, "Dagger": 8225,
    "bull": 8226, "hellip": 8230, "permil": 8240, "prime": 8242,
    "Prime": 8243, "lsaquo": 8249, "rsaquo": 8250, "oline": 8254,
    "frasl": 8260, "euro": 8364, "image": 8465, "weierp": 8472,
    "real": 8476, "trade": 8482, "alefsym": 8501, "larr": 8592,
    "uarr": 8593, "rarr": 8594, "darr": 8595, "harr": 8596,
    "crarr": 8629, "lArr": 8656, "uArr": 8657, "rArr": 8658,
    "dArr": 8659, "hArr": 8660, "forall": 8704, "part": 8706,
    "exist": 8707, "empty": 8709, "nabla": 8711, "isin": 8712,
    "notin": 8713, "ni": 8715, "prod": 8719, "sum": 8721,
    "minus": 8722, "lowast": 8727, "radic": 8730, "prop": 8733,
    "infin": 8734, "ang": 8736, "and": 8743, "or": 8744, "cap": 8745,
    "cup": 8746, "int": 8747, "there4": 8756, "sim": 8764,
    "cong": 8773, "asymp": 8776, "ne": 8800, "equiv": 8801, "le": 8804,
    "ge": 8805, "sub": 8834, "sup": 8835, "nsub": 8836, "sube": 8838,
    "supe": 8839, "oplus": 8853, "otimes": 8855, "perp": 8869,
    "sdot": 8901, "lceil": 8968, "rceil": 8969, "lfloor": 8970,
    "rfloor": 8971, "lang": 9001, "rang": 9002, "loz": 9674,
    "spades": 9824, "clubs": 9827, "hearts": 9829, "diams": 9830,
}

#: entity name (exact table key, possibly with trailing ';') -> char
ENTITY2CHAR: dict[str, str] = {}
for _k, _v in _LATIN1.items():
    ENTITY2CHAR[_k] = _v if isinstance(_v, str) else chr(_v)
for _k, _v in _UNICODE.items():
    ENTITY2CHAR[_k + ";"] = chr(_v)

#: char -> '&name;' reverse map (Entities.pm:422-433); apos is one-way
CHAR2ENTITY: dict[str, str] = {}
for _k, _c in ENTITY2CHAR.items():
    CHAR2ENTITY[_c] = "&" + _k.rstrip(";") + ";"
del CHAR2ENTITY["'"]
for _i in range(256):
    CHAR2ENTITY.setdefault(chr(_i), "&#%d;" % _i)

_ALNUM_RE = re.compile(r"[A-Za-z0-9_]+")
_DEC_RE = re.compile(r"[0-9]+")
_HEX_RE = re.compile(r"[0-9A-Fa-f]+")


def _chop_utf8_bytes(out: list[str], nbytes: int) -> None:
    """Remove the last ``nbytes`` UTF-8 bytes from the accumulated
    output parts (the reference decoder works on the raw byte buffer,
    so its back-up is byte-granular, not char-granular)."""
    tail = ""
    while out and len(tail.encode("utf-8", "surrogatepass")) < nbytes:
        tail = out.pop() + tail
    b = tail.encode("utf-8", "surrogatepass")
    out.append(b[:-nbytes].decode("utf-8", "surrogateescape"))


def decode_entities(s: str, expand_prefix: bool = False) -> str:
    """Decode HTML entities exactly like the reference C decoder.

    ``expand_prefix=True`` matches the dtext path (`hparser.c:546`);
    ``False`` matches the attribute-value path (`hparser.c:472`).
    """
    if "&" not in s:
        return s
    out: list[str] = []
    i = 0
    n = len(s)
    high_surrogate = 0
    while True:
        j = s.find("&", i)
        if j < 0:
            out.append(s[i:])
            break
        out.append(s[i:j])
        i = j + 1  # past '&'
        repl = None
        ent_start = i
        if i < n and s[i] == "#":
            i += 1
            num = 0
            ok = False
            overflow = False
            if i < n and s[i] in "xX":
                i += 1
                m = _HEX_RE.match(s, i)
                if m:
                    for ch in m.group(0):
                        num = (num << 4) | int(ch, 16)
                        i += 1
                        if num > 0x10FFFF:
                            overflow = True
                            break
                        ok = True
            else:
                m = _DEC_RE.match(s, i)
                if m:
                    for ch in m.group(0):
                        num = num * 10 + int(ch)
                        i += 1
                        if num > 0x10FFFF:
                            overflow = True
                            break
                        ok = True
            if overflow:
                ok = False
            if num and ok:
                if num in (0xFFFE, 0xFFFF):
                    pass  # illegal; leave intact (util.c:137-139)
                elif (num & 0xFFFFFC00) == 0xDC00:  # low surrogate
                    if high_surrogate:
                        # back up 3 BYTES (util.c:144 "t -= 3"): the C
                        # assumes they are the U+FFFD emitted for the
                        # high surrogate, but a failed numeric entity
                        # in between leaves high_surrogate set and the
                        # chop then eats whatever 3 bytes precede —
                        # replicated bug-for-bug (verified against the
                        # compiled reference by scripts/ref_diff.py)
                        _chop_utf8_bytes(out, 3)
                        num = (
                            ((high_surrogate - 0xD800) << 10)
                            + (num - 0xDC00)
                            + 0x10000
                        )
                        high_surrogate = 0
                        repl = chr(num)
                    else:
                        repl = "�"
                elif (num & 0xFFFFFC00) == 0xD800:  # high surrogate
                    high_surrogate = num
                    repl = "�"
                else:
                    high_surrogate = 0
                    if 0xFDD0 <= num <= 0xFDEF or (num & 0xFFFE) == 0xFFFE:
                        num = 0xFFFD
                    repl = chr(num)
        else:
            m = _ALNUM_RE.match(s, i)
            if m:
                name = m.group(0)
                i = m.end()
                repl = ENTITY2CHAR.get(name)
                if repl is None and i < n and s[i] == ";":
                    repl = ENTITY2CHAR.get(name + ";")
                if repl is None and expand_prefix:
                    for k in range(len(name) - 1, 0, -1):
                        hit = ENTITY2CHAR.get(name[:k])
                        if hit is not None:
                            repl = hit
                            i = ent_start + k
                            break
            high_surrogate = 0
        if repl is not None:
            if i < n and s[i] == ";":
                i += 1
            out.append(repl)
            if i < n and s[i] != "&":
                high_surrogate = 0
        else:
            out.append(s[j:i])  # copy '&' + scanned chars verbatim
    return "".join(out)


# default unsafe set: controls, high-bit chars and <&>'" (Entities.pm:462)
_DEFAULT_UNSAFE_RE = re.compile(r"[^\n\r\t !\#$%(-;=?-~]")


def _num_entity(ch: str) -> str:
    return "&#x%X;" % ord(ch)


def _unsafe_re(unsafe_chars: str | None):
    """Build the char-class regex like Entities.pm:447-459: the arg is
    a regex character-class *body* (ranges allowed); only ']' '/' and a
    trailing backslash get escaped."""
    if unsafe_chars is None or not unsafe_chars:
        return _DEFAULT_UNSAFE_RE
    chars = re.sub(r"(?<!\\)([\]/])", r"\\\1", unsafe_chars)
    chars = re.sub(r"(?<!\\)\\\Z", r"\\\\", chars)
    return re.compile("[%s]" % chars)


def encode_entities(s: str, unsafe_chars: str | None = None) -> str:
    """Replace unsafe chars with named (or numeric) entities.

    Mirrors ``HTML::Entities::encode_entities`` (Entities.pm:437-465).
    ``unsafe_chars`` is a character-class body like ``<>&\"`` or ``a-c``.
    """
    rx = _unsafe_re(unsafe_chars)
    return rx.sub(
        lambda m: CHAR2ENTITY.get(m.group(0)) or _num_entity(m.group(0)), s
    )


def encode_entities_numeric(s: str, unsafe_chars: str | None = None) -> str:
    """Always use numeric entities (Entities.pm:467-470)."""
    rx = _unsafe_re(unsafe_chars)
    return rx.sub(lambda m: _num_entity(m.group(0)), s)
