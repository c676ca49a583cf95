"""Bloblang-subset front end: parser, interpreter, Catalyst compiler."""

from .values import (  # noqa: F401
    BloblangError,
    Delete,
    Nothing,
    Unassigned,
    canonical_json,
    serialize,
    to_string,
)
from .parser import parse_mapping, parse_query, parse_interpolation  # noqa: F401
from .interp import (  # noqa: F401
    Interpreter,
    InterpolatedField,
    Part,
    compile_mapping,
)
