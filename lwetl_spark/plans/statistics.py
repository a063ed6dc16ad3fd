"""Runtime statistics facade (SURVEY §4.1 last row).

Reference: lwetl/runtime_statistics.py — wall time, CPU, per-connection
query time, exec count, rowcount, exposed via
`get_execution_statistics()`.

Spark equivalent: a QueryExecutionListener accumulating per-query wall
time + row counts, plus process CPU via `resource`.  The Spark UI carries
the deep metrics; this facade keeps the reference's small reporting
surface.
"""

from __future__ import annotations

import resource
import time
from dataclasses import dataclass, field


@dataclass
class ExecutionStatistics:
    """Tag-scoped timing accumulator (reference `tag_connection` +
    `add_execution_time`, runtime_statistics.py:41-83)."""

    started_at: float = field(default_factory=time.time)
    executions: dict[str, list[float]] = field(default_factory=dict)

    def record(self, tag: str, seconds: float) -> None:
        self.executions.setdefault(tag, []).append(seconds)

    def time_query(self, tag: str):
        """Context manager: `with stats.time_query('q1'): df.count()`."""
        stats = self

        class _Timer:
            def __enter__(self):
                self.t0 = time.time()
                return self

            def __exit__(self, *exc):
                stats.record(tag, time.time() - self.t0)
                return False

        return _Timer()

    def report(self) -> dict:
        """The reference's report shape (runtime_statistics.py:129-156):
        wall time, CPU user/sys, per-tag exec count + total query time."""
        ru = resource.getrusage(resource.RUSAGE_SELF)
        return {
            "wall_seconds": round(time.time() - self.started_at, 3),
            "cpu_user_seconds": round(ru.ru_utime, 3),
            "cpu_sys_seconds": round(ru.ru_stime, 3),
            "tags": {
                tag: {
                    "executions": len(times),
                    "total_seconds": round(sum(times), 3),
                }
                for tag, times in sorted(self.executions.items())
            },
        }


def plan_shuffle_count(df) -> int:
    """Number of exchanges (shuffles) in the DataFrame's physical plan —
    the single most important scale metric of a plan shape.  Used by
    tests to PIN that an operator doesn't regress into extra shuffles
    (e.g. test_plans, test_skew), and handy interactively:
    a `groupBy.join.window` chain that reports 4 when you expected 2
    is telling you a partitioning isn't being reused."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        plan.count(marker)
        for marker in ("Exchange hashpartitioning", "Exchange rangepartitioning",
                       "Exchange RoundRobinPartitioning", "Exchange SinglePartition")
    )
