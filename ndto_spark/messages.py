"""Violation message templates, byte-for-byte mirrors of the reference.

Every template below reproduces the exact text the reference's generated
validators emit (nomasystems/ndto). Citations point into /root/reference.

Quirk preserved on purpose: the reference formats the min/max_length message
at *generate* time with the literal string "Length" as the ~p argument
(src/ndto_generator/ndto_generator_string.erl:118-131, 160-175), so the
runtime message literally contains `"Length"` (with quotes), not the actual
string length. We reproduce that for violation-row parity.
"""

from __future__ import annotations


def _article(type_name: str) -> str:
    # src/ndto_SUITE.erl:180-187 — "an" for types starting with a vowel-ish
    # char (a/o/i), "a" otherwise.
    return "an" if type_name[0] in ("a", "o", "i") else "a"


def type_msg(type_name: str) -> str:
    """src/ndto_generator/ndto_generator_*.erl false_clause messages."""
    return f"Value is not {_article(type_name)} {type_name}"


def minimum_msg(minimum, exclusive: bool) -> str:
    """src/ndto_generator/ndto_generator_integer.erl:129-133 (same for float)."""
    term = "than" if exclusive else "or equal to"
    return f"Value is not a number greater {term} {fmt_num(minimum)}"


def maximum_msg(maximum, exclusive: bool) -> str:
    """src/ndto_generator/ndto_generator_integer.erl:173-177 (same for float)."""
    term = "than" if exclusive else "or equal to"
    return f"Number is not lower {term} {fmt_num(maximum)}"


def multiple_of_msg(multiple_of) -> str:
    """src/ndto_generator/ndto_generator_integer.erl:206-212."""
    return f"Value is not multiple of {fmt_num(multiple_of)}"


def min_length_msg(min_length: int) -> str:
    """src/ndto_generator/ndto_generator_string.erl:118-131 (see module quirk note)."""
    return f'String length "Length" is less than {min_length}'


def max_length_msg(max_length: int) -> str:
    """src/ndto_generator/ndto_generator_string.erl:160-175."""
    return f'String length "Length" is greater than {max_length}'


def pattern_msg(pattern: str) -> str:
    """src/ndto_generator/ndto_generator_string.erl:222."""
    return f"String does not match pattern {pattern}"


ISO8601_MSG = "String is not a valid ISO8601 date"  # ndto_generator_string.erl:263
BASE64_LENGTH_MSG = "String length is not a multiple of 4"  # ndto_generator_string.erl:397
ENUM_MSG = "Value is not one in the enum"  # ndto_generator_enum.erl:41
EMPTY_MSG = "Unexpected value for false schema"  # ndto_generator_empty.erl:29
UNIQUE_ITEMS_MSG = "Array has non unique items"  # ndto_generator_array.erl:542
ANY_OF_NONE_MSG = (
    "Value is not matching at least one condition. None matched."
)  # ndto_generator_union.erl:87
ONE_OF_NONE_MSG = (
    "Value is not matching exactly one condition. None matched."
)  # ndto_generator_symmetric_difference.erl:86
ONE_OF_MANY_TEMPLATE = (
    "Value is not matching exactly one condition. "
    "More than one (conditions %s and %s) matched."
)  # ndto_generator_symmetric_difference.erl:122 (args printed [Second, First])
ALL_OF_TEMPLATE = (
    "Value is not matching all conditions. "
    "Condition %s failed because of schema path '%s' : %s"
)  # ndto_generator_intersection.erl:99
ITEMS_TEMPLATE = "Item %s in %s is invalid. %s"  # ndto_generator_array.erl:184


def min_items_msg(n: int) -> str:
    """src/ndto_generator/ndto_generator_array.erl:472-476."""
    return f"Array does not have at least {n} items"


def max_items_msg(n: int) -> str:
    """src/ndto_generator/ndto_generator_array.erl:495-499."""
    return f"Array does not have at most {n} items"


def min_properties_msg(n: int) -> str:
    """src/ndto_generator/ndto_generator_object.erl:305-312."""
    return f"Object has less properties than required minimum ({n})"


def max_properties_msg(n: int) -> str:
    """src/ndto_generator/ndto_generator_object.erl:361-368."""
    return f"Object has more properties than allowed maximum ({n})"


def required_template(prefix: str) -> str:
    """src/ndto_generator/ndto_generator_object.erl:240-250.

    The reference formats the missing property with ~p on a binary, which
    prints Erlang binary syntax: `$ is missing required property <<"foo">>`.
    """
    return prefix + ' is missing required property <<"%s">>'


PROPERTY_FAILED_TEMPLATE = (
    'Property "%s" failed validation: %s'
)  # ndto_generator_object.erl:569,1015
UNSUPPORTED_KEYS_TEMPLATE = (
    "Object has unsupported keys: %s"
)  # ndto_generator_object.erl:764 (keys joined by format_properties: "a", "b")


def fmt_num(x) -> str:
    """Format a numeric bound like Erlang's ~p (ints bare, floats shortest)."""
    if isinstance(x, bool):
        return "true" if x else "false"
    if isinstance(x, int):
        return str(x)
    return repr(float(x))
