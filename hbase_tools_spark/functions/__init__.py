"""Shared column-expression library: severity cascades, weight formulas,
epoch helpers, byte-key functions.  Encoding these once keeps every query
consistent (SURVEY.md §7 'non-standard semantics')."""

from .exprs import compaction_weight, dsum, epoch_bigint

__all__ = ["compaction_weight", "dsum", "epoch_bigint"]
