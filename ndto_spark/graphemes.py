"""UAX #29 extended grapheme cluster segmentation (pure Python).

Erlang's ``string:length/1`` counts extended grapheme clusters
(/root/reference/src/ndto_generator/ndto_generator_string.erl:104 via
stdlib ``string``), so the opt-in grapheme string_length mode must apply
the full break algorithm — combining marks and ZWJ alone miss regional
indicators (flags), decomposed Hangul jamo, prepended concatenation marks
and emoji modifier sequences.

Implements rules GB1-GB13 + GB999 of UAX #29 (Unicode 15 property data):

- GB3      CR x LF
- GB4/GB5  break around Control | CR | LF
- GB6-GB8  Hangul syllable composition (L/V/T/LV/LVT)
- GB9/9a   no break before Extend, ZWJ, SpacingMark
- GB9b     no break after Prepend
- GB11     Extended_Pictographic Extend* ZWJ x Extended_Pictographic
- GB12/13  regional indicators join only in pairs
- GB999    otherwise break

Property classes are derived from ``unicodedata`` categories plus the
explicit code-point tables below (Prepend, Other_Grapheme_Extend, Hangul
blocks, Regional_Indicator, and the condensed Extended_Pictographic
ranges from emoji-data). Known approximation: SpacingMark is taken as
category Mc without the handful of UAX exceptions (Thai/Lao SARA AM et
al.) — those characters join here where a strict segmenter breaks.
"""

from __future__ import annotations

import unicodedata
from bisect import bisect_right

# -- explicit property tables (inclusive ranges) -----------------------------

_PREPEND = [
    (0x0600, 0x0605), (0x06DD, 0x06DD), (0x070F, 0x070F), (0x0890, 0x0891),
    (0x08E2, 0x08E2), (0x0D4E, 0x0D4E), (0x110BD, 0x110BD), (0x110CD, 0x110CD),
    (0x111C2, 0x111C3), (0x1193F, 0x1193F), (0x11941, 0x11941),
    (0x11A3A, 0x11A3A), (0x11A84, 0x11A89), (0x11D46, 0x11D46),
    (0x11F02, 0x11F02),
]

# Other_Grapheme_Extend: spacing marks (Mc) and format chars that still
# carry Grapheme_Extend=Yes, so category checks alone miss them.
_OTHER_EXTEND = [
    (0x09BE, 0x09BE), (0x09D7, 0x09D7), (0x0B3E, 0x0B3E), (0x0B57, 0x0B57),
    (0x0BBE, 0x0BBE), (0x0BD7, 0x0BD7), (0x0CC2, 0x0CC2), (0x0CD5, 0x0CD6),
    (0x0D3E, 0x0D3E), (0x0D57, 0x0D57), (0x0DCF, 0x0DCF), (0x0DDF, 0x0DDF),
    (0x1715, 0x1715), (0x171F, 0x171F), (0x1B35, 0x1B35), (0x200C, 0x200C),
    (0x302E, 0x302F), (0x3099, 0x309A), (0x1133E, 0x1133E), (0x11357, 0x11357),
    (0x114B0, 0x114B0), (0x114BD, 0x114BD), (0x115AF, 0x115AF),
    (0x11930, 0x11930), (0x1D165, 0x1D165), (0x1D16E, 0x1D172),
    (0xE0020, 0xE007F), (0xFF9E, 0xFF9F),
]

# condensed Extended_Pictographic ranges (emoji-data)
_EXT_PICT = [
    (0x00A9, 0x00A9), (0x00AE, 0x00AE), (0x203C, 0x203C), (0x2049, 0x2049),
    (0x2122, 0x2122), (0x2139, 0x2139), (0x2194, 0x2199), (0x21A9, 0x21AA),
    (0x231A, 0x231B), (0x2328, 0x2328), (0x2388, 0x2388), (0x23CF, 0x23CF),
    (0x23E9, 0x23F3), (0x23F8, 0x23FA), (0x24C2, 0x24C2), (0x25AA, 0x25AB),
    (0x25B6, 0x25B6), (0x25C0, 0x25C0), (0x25FB, 0x25FE), (0x2600, 0x2605),
    (0x2607, 0x2612), (0x2614, 0x2685), (0x2690, 0x2705), (0x2708, 0x2712),
    (0x2714, 0x2714), (0x2716, 0x2716), (0x271D, 0x271D), (0x2721, 0x2721),
    (0x2728, 0x2728), (0x2733, 0x2734), (0x2744, 0x2744), (0x2747, 0x2747),
    (0x274C, 0x274C), (0x274E, 0x274E), (0x2753, 0x2755), (0x2757, 0x2757),
    (0x2763, 0x2767), (0x2795, 0x2797), (0x27A1, 0x27A1), (0x27B0, 0x27B0),
    (0x27BF, 0x27BF), (0x2934, 0x2935), (0x2B05, 0x2B07), (0x2B1B, 0x2B1C),
    (0x2B50, 0x2B50), (0x2B55, 0x2B55), (0x3030, 0x3030), (0x303D, 0x303D),
    (0x3297, 0x3297), (0x3299, 0x3299), (0x1F000, 0x1F0FF), (0x1F10D, 0x1F10F),
    (0x1F12F, 0x1F12F), (0x1F16C, 0x1F171), (0x1F17E, 0x1F17F),
    (0x1F18E, 0x1F18E), (0x1F191, 0x1F19A), (0x1F1AD, 0x1F1E5),
    (0x1F201, 0x1F20F), (0x1F21A, 0x1F21A), (0x1F22F, 0x1F22F),
    (0x1F232, 0x1F23A), (0x1F23C, 0x1F23F), (0x1F249, 0x1F3FA),
    (0x1F400, 0x1F53D), (0x1F546, 0x1F64F), (0x1F680, 0x1F6FF),
    (0x1F774, 0x1F77F), (0x1F7D5, 0x1F7FF), (0x1F80C, 0x1F80F),
    (0x1F848, 0x1F84F), (0x1F85A, 0x1F85F), (0x1F888, 0x1F88F),
    (0x1F8AE, 0x1F8FF), (0x1F90C, 0x1F93A), (0x1F93C, 0x1F945),
    (0x1F947, 0x1FAFF), (0x1FC00, 0x1FFFD),
]


def _table(ranges: list[tuple[int, int]]):
    starts = [r[0] for r in ranges]
    ends = [r[1] for r in ranges]

    def contains(cp: int) -> bool:
        i = bisect_right(starts, cp) - 1
        return i >= 0 and cp <= ends[i]

    return contains


_is_prepend = _table(_PREPEND)
_is_other_extend = _table(_OTHER_EXTEND)
_is_ext_pict = _table(sorted(_EXT_PICT))

# -- grapheme cluster break classes ------------------------------------------

CR, LF, CONTROL, EXTEND, ZWJ, RI, PREPEND, SPACINGMARK = range(8)
L, V, T, LV, LVT, OTHER = range(8, 14)


def _gcb(ch: str) -> int:
    cp = ord(ch)
    if cp == 0x000D:
        return CR
    if cp == 0x000A:
        return LF
    if cp == 0x200D:
        return ZWJ
    if 0x1F1E6 <= cp <= 0x1F1FF:
        return RI
    if _is_prepend(cp):
        return PREPEND
    # Hangul
    if 0x1100 <= cp <= 0x115F or 0xA960 <= cp <= 0xA97C:
        return L
    if 0x1160 <= cp <= 0x11A7 or 0xD7B0 <= cp <= 0xD7C6:
        return V
    if 0x11A8 <= cp <= 0x11FF or 0xD7CB <= cp <= 0xD7FB:
        return T
    if 0xAC00 <= cp <= 0xD7A3:
        return LV if (cp - 0xAC00) % 28 == 0 else LVT
    if _is_other_extend(cp) or 0x1F3FB <= cp <= 0x1F3FF:  # + emoji modifiers
        return EXTEND
    cat = unicodedata.category(ch)
    if cat in ("Mn", "Me"):
        return EXTEND
    if cat == "Mc":
        return SPACINGMARK
    # Cn (unassigned) defaults to Other per UAX #29 — emoji assigned after
    # this Python's Unicode tables still hit the _EXT_PICT ranges that way
    if cat in ("Cc", "Cf", "Zl", "Zp", "Cs"):
        return CONTROL
    return OTHER


def _breaks_before(
    prev: int, cur: int, ri_run: int, pict_zwj: bool
) -> bool:
    """True iff a cluster boundary falls between prev and cur."""
    if prev == CR and cur == LF:  # GB3
        return False
    if prev in (CONTROL, CR, LF):  # GB4
        return True
    if cur in (CONTROL, CR, LF):  # GB5
        return True
    if prev == L and cur in (L, V, LV, LVT):  # GB6
        return False
    if prev in (LV, V) and cur in (V, T):  # GB7
        return False
    if prev in (LVT, T) and cur == T:  # GB8
        return False
    if cur in (EXTEND, ZWJ):  # GB9
        return False
    if cur == SPACINGMARK:  # GB9a
        return False
    if prev == PREPEND:  # GB9b
        return False
    if prev == ZWJ and pict_zwj and cur == OTHER:  # GB11 (cur ExtPict checked by caller)
        return False
    if prev == RI and cur == RI and ri_run % 2 == 1:  # GB12/GB13
        return False
    return True  # GB999


def count(s: str) -> int:
    """Number of extended grapheme clusters in ``s``."""
    n = 0
    prev_cls = None
    ri_run = 0  # consecutive regional indicators ending at prev
    pict_base = False  # current cluster matches ExtPict Extend*
    pict_zwj = False  # current cluster matches ExtPict Extend* ZWJ
    for ch in s:
        cls = _gcb(ch)
        is_pict = cls == OTHER and _is_ext_pict(ord(ch))
        if prev_cls is None:
            boundary = True
        else:
            boundary = _breaks_before(
                prev_cls, cls, ri_run, pict_zwj and is_pict
            )
        if boundary:
            n += 1
            ri_run = 1 if cls == RI else 0
            pict_base, pict_zwj = is_pict, False
        else:
            ri_run = ri_run + 1 if cls == RI else 0
            if cls == EXTEND and pict_base and not pict_zwj:
                pass  # ExtPict Extend* — GB11 left side survives
            elif cls == ZWJ and pict_base and not pict_zwj:
                pict_zwj = True  # ExtPict Extend* ZWJ
            elif is_pict and pict_zwj:
                pict_base, pict_zwj = True, False  # GB11 join; sequence restarts
            else:
                pict_base, pict_zwj = False, False
        prev_cls = cls
    return n
