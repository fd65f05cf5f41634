"""Batched validation errors.

The reference accumulates configuration problems in a ``FailureCollector`` and
throws them as one batch at the end of analysis
(``WindowAggregation.java:118-133``, ``:131`` ``collector.getOrThrowException()``).
That error-collection UX is worth keeping: a user with three bad aggregate specs
sees all three messages at once.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class ValidationFailure:
    """One analysis problem: what went wrong and how to fix it."""

    message: str
    correction: str | None = None

    def __str__(self) -> str:
        if self.correction:
            return f"{self.message} {self.correction}"
        return self.message


class ValidationError(Exception):
    """Raised with every accumulated failure from one analysis pass."""

    def __init__(self, failures: list[ValidationFailure]):
        self.failures = list(failures)
        lines = "\n".join(f"  - {f}" for f in self.failures)
        super().__init__(
            f"Window aggregation plan failed validation with "
            f"{len(self.failures)} error(s):\n{lines}"
        )


@dataclass
class FailureCollector:
    """Accumulates :class:`ValidationFailure` during analysis; throws as a batch."""

    failures: list[ValidationFailure] = field(default_factory=list)

    def add_failure(self, message: str, correction: str | None = None) -> None:
        self.failures.append(ValidationFailure(message, correction))

    def get_or_throw(self) -> None:
        if self.failures:
            raise ValidationError(self.failures)
