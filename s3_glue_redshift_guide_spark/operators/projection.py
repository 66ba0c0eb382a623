"""P1-P5 — the "Change schema" transform.

The reference's Glue job has exactly one declared transform: Change schema
(README.md:149), customizable by "renaming, reordering, adding, or removing
destination columns" (README.md:151), with types applied on the way out of
the string-first CSV read (README.md:125-131). This module is that transform
as a declarative, serializable mapping: a list of (source expression ->
destination name/type) rules applied as ONE ``select``.

One select matters at scale: Catalyst collapses it into the scan projection,
so removed columns are never read off disk (column pruning reaches the
Parquet/CSV reader) and casts run inside whole-stage codegen.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, functions as F


@dataclass(frozen=True)
class FieldMapping:
    """One destination column: where it comes from and what type it gets.

    ``source`` is a column name or any SQL expression (``expr``-parsed), so
    "add a derived column" (P4) is just a mapping whose source is an
    expression. ``cast`` is a DDL type string ("int", "timestamp", ...) or
    None to keep the source type.
    """

    dest: str
    source: str | None = None  # defaults to dest (identity rename)
    cast: str | None = None

    def to_column(self) -> Column:
        col = F.expr(self.source if self.source is not None else self.dest)
        if self.cast:
            # try_cast: malformed source values null the cell (Glue/OpenCSV
            # semantics) instead of failing the job under ANSI mode.
            col = col.try_cast(self.cast)
        return col.alias(self.dest)


@dataclass
class SchemaMapping:
    """The full Change-schema transform: an ordered list of FieldMappings.

    Destination order IS the list order (P3 reorder); any source column not
    mentioned is dropped (P1 remove); renames are dest != source (P2); casts
    are the string->typed step OpenCSVSerde defers (P5).
    """

    fields: list[FieldMapping] = field(default_factory=list)

    @classmethod
    def from_dict(cls, mapping: dict[str, str | tuple[str, str]]) -> "SchemaMapping":
        """Compact form: ``{dest: source}`` or ``{dest: (source, type)}``."""
        out = []
        for dest, spec in mapping.items():
            if isinstance(spec, tuple):
                out.append(FieldMapping(dest=dest, source=spec[0], cast=spec[1]))
            else:
                out.append(FieldMapping(dest=dest, source=spec))
        return cls(out)

    def apply(self, df: DataFrame) -> DataFrame:
        return df.select(*[f.to_column() for f in self.fields])
