"""Run instrumentation (SURVEY.md §2.6 A3 / §2.2 K4 parity).

The reference tallies driver-side counters and writes a text report
(PerformanceTracker, idx_transform.py:29-74,390-397; run summaries
yfinance_transform.py:155-161, IQ*:137-144). Engine version:

- `observe()`-based row/sum metrics collected DURING the job — no extra
  action, unlike the reference's df.count() re-scans;
- a PipelineTracker that aggregates per-stage wall-clock + docs/sec and
  renders the same style of report.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, functions as F


def observed_count(df: DataFrame, name: str = "metrics") -> tuple[DataFrame, Observation]:
    """Attach an Observation counting rows (and null-free rows are a
    caller add-on). Read `obs.get` AFTER an action has run the plan."""
    obs = Observation(name)
    return df.observe(obs, F.count(F.lit(1)).alias("n_rows")), obs


@dataclass
class StageStats:
    name: str
    seconds: float
    rows: int

    @property
    def rows_per_sec(self) -> float:
        return self.rows / self.seconds if self.seconds > 0 else 0.0


@dataclass
class PipelineTracker:
    """Per-stage wall-clock + throughput tally (PerformanceTracker
    parity, idx_transform.py:29-74)."""

    stages: list[StageStats] = field(default_factory=list)
    _t0: float = field(default_factory=time.time)

    def time_stage(self, name: str, df: DataFrame) -> DataFrame:
        """Run `df` to completion under an Observation; record stats."""
        observed, obs = observed_count(df, f"stage_{name}_{len(self.stages)}")
        t0 = time.perf_counter()
        observed.write.format("noop").mode("overwrite").save()
        secs = time.perf_counter() - t0
        rows = int(obs.get["n_rows"])
        self.stages.append(StageStats(name, secs, rows))
        return df

    def report(self) -> str:
        lines = ["=== PIPELINE REPORT ==="]
        total_rows = 0
        for s in self.stages:
            total_rows += s.rows
            lines.append(
                f"{s.name}: {s.rows} rows in {s.seconds:.2f}s "
                f"({s.rows_per_sec:.1f} rows/sec)"
            )
        lines.append(f"total rows: {total_rows}")
        lines.append(f"total wall: {time.time() - self._t0:.2f}s")
        return "\n".join(lines)

    def write_report(self, path: str) -> None:
        """K4 parity: driver-side report file (performance_report.txt,
        idx_transform.py:390-397)."""
        with open(path, "w") as f:
            f.write(self.report() + "\n")
