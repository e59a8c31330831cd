"""Click parameter types shared by the CLIs (reference utils.py:742-814)."""

from __future__ import annotations

from typing import Any

import click


class CommaSeparated(click.ParamType):
    """Parse "a,b,c" into a typed list; optionally enforce exactly n items."""

    name = "comma_separated"

    def __init__(self, type_: type = str, n: int | None = None) -> None:
        if n is not None and n <= 0:
            raise ValueError("n must be None or a positive integer")
        self.type = type_
        self.n = n

    def convert(self, value, param, ctx) -> list[Any] | None:
        if value is None:
            return None
        if isinstance(value, list):
            return value
        value = value.strip()
        if value == "":
            return []
        items = value.split(",")
        if self.n is not None and len(items) != self.n:
            self.fail(
                f"{value} does not contain exactly {self.n} comma separated values",
                param,
                ctx,
            )
        try:
            return [self.type(item) for item in items]
        except ValueError:
            self.fail(
                f"{value} is not a valid comma separated list of {self.type.__name__}",
                param,
                ctx,
            )
