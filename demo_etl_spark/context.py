"""Deterministic run context.

The reference is nondeterministic: it calls ``current_date()`` /
``current_timestamp()`` (reference generate-asset.scala:73-74,195,203,211),
wall-clock ``LocalDate.now`` and ``UUID.randomUUID`` (generate-asset.scala:30).
SURVEY.md §0 Caveat C requires parameterizing "now" and the job id so results
are reproducible and oracle-testable. Every operator in this engine takes a
``RunContext`` instead of touching the wall clock.
"""

from __future__ import annotations

import datetime as _dt
import uuid
from dataclasses import dataclass, field

# The driver test data's order dates span 1995-01-01 .. 2001-08-01 and
# lineitem ship dates end 2001-11-04 (stable across all scale factors).
# 2002-01-01 is the canonical "today" for days-since / recency logic.
ANCHOR_DATE = _dt.date(2002, 1, 1)
ANCHOR_SQL = "DATE '2002-01-01'"

# Date-dimension coverage window (J1): spans the full fact date domain.
DATE_DIM_START = _dt.date(1995, 1, 1)
DATE_DIM_END = _dt.date(2002, 1, 1)  # exclusive


@dataclass(frozen=True)
class RunContext:
    """Injectable identity + clock for a pipeline run.

    Replaces the reference's ``UUID.randomUUID`` job id
    (generate-asset.scala:30) and ``current_date()/current_timestamp()``
    call sites with values fixed at construction time.
    """

    job_id: str = "job-00000000"
    anchor_date: _dt.date = ANCHOR_DATE
    job_timestamp: _dt.datetime = field(
        default_factory=lambda: _dt.datetime(2002, 1, 1, 0, 0, 0)
    )
    recent_days: int = 90  # the job-1 "recent orders" cutoff (SURVEY §2.2 P3)

    @staticmethod
    def fresh(anchor_date: _dt.date = ANCHOR_DATE) -> "RunContext":
        """A real run: random job id, wall-clock timestamp, fixed anchor."""
        return RunContext(
            job_id=str(uuid.uuid4()),
            anchor_date=anchor_date,
            job_timestamp=_dt.datetime.now(),
        )


#: Context used by the oracle-checked query surface — fully deterministic.
DEFAULT_CONTEXT = RunContext()
