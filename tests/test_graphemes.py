"""UAX #29 grapheme segmentation + the opt-in grapheme string_length mode.

Erlang string:length/1 counts extended grapheme clusters
(ndto_generator_string.erl:104); these cases pin the break rules the naive
combining-marks approach misses: regional indicators (GB12/13), Hangul jamo
(GB6-8), prepend (GB9b), emoji ZWJ/modifier sequences (GB11).
"""

from __future__ import annotations

import pytest

from ndto_spark.graphemes import count


@pytest.mark.parametrize(
    "s, want",
    [
        ("", 0),
        ("abc", 3),
        ("é", 1),  # combining acute (GB9)
        ("äb́", 2),
        ("\r\n", 1),  # GB3
        ("\r\na", 2),  # GB4: break after control
        ("a\tb", 3),  # GB4/5 around control
        # regional indicators join only in PAIRS (GB12/13)
        ("\U0001F1FA\U0001F1F8\U0001F1EB\U0001F1F7", 2),  # US + FR flags
        ("\U0001F1FA\U0001F1F8\U0001F1EB", 2),  # flag + dangling RI
        ("\U0001F1FA\U0001F1F8\U0001F1FA\U0001F1F8\U0001F1FA", 3),
        # Hangul jamo composition (GB6-8)
        ("한", 1),  # L V T = 한
        ("가", 1),  # L V
        ("각", 1),  # precomposed LVT
        ("각", 1),  # LV + T
        ("ᄀ각", 1),  # L L V T
        ("ᅡᄀ", 2),  # V then L breaks
        # emoji (GB11 + modifiers-as-Extend)
        ("\U0001F468‍\U0001F469‍\U0001F467", 1),  # family ZWJ
        ("\U0001F44D\U0001F3FD", 1),  # thumbs up + skin tone
        ("\U0001F44D\U0001F44D", 2),
        ("a‍b", 2),  # ZWJ joins left (GB9) but no GB11 for non-picto
        # prepend (GB9b)
        ("؀١", 1),  # ARABIC NUMBER SIGN + digit
        ("؀١٢", 2),
        # Thai SARA AM is Lo and UAX-excluded from SpacingMark: breaks
        ("กำ", 2),
        # Devanagari: virama is Extend (Mn) so KA+virama joins, SSA breaks
        ("क्ष", 2),
    ],
)
def test_grapheme_count(s, want):
    assert count(s) == want, [hex(ord(c)) for c in s]


def test_grapheme_length_mode_end_to_end(spark):
    """min/max_length with string_length='grapheme' counts clusters."""
    from ndto_spark.compiler import CompileOptions
    from tests.conftest import check

    opts = CompileOptions(string_length="grapheme")
    schema = {"type": "string", "min_length": 2, "max_length": 2}
    flags = "\U0001F1FA\U0001F1F8\U0001F1EB\U0001F1F7"  # 2 flags, 4 codepoints
    assert check(spark, schema, flags, "string", options=opts) is True
    # JVM mode counts codepoints (4) and fails max_length
    assert check(spark, schema, flags, "string") == (
        "$.max_length",
        'String length "Length" is greater than 2',
    )
    family = "\U0001F468‍\U0001F469‍\U0001F467"  # 1 cluster
    assert check(spark, schema, family, "string", options=opts) == (
        "$.min_length",
        'String length "Length" is less than 2',
    )
