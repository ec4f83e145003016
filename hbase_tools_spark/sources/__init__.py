"""Source/sink lifecycle operations (SURVEY.md §2.1 SC5/SC7/SC8/SC9)."""

from . import tables  # noqa: F401

__all__ = ["tables"]
