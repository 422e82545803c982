"""In-process pipeline runner (SURVEY.md §2.12).

Replaces the reference's Airflow DAG machinery (etl_aws_vini.py:
404-658) with plain Python: steps are functions with declared
dependencies; values flow as return values instead of XCom; the EMR
cluster/step/sensor lifecycle collapses into one SparkSession. Kept
semantics: dependency ordering, per-step retries (DAG default
retries=1, `:408`), file-arrival sensing (S3KeySensor, `:459-468`),
failure callback (SNS email hook, `:337-346`), and post-load
row-count reconciliation (`:244-256`).
"""

from __future__ import annotations

import glob
import time
from collections.abc import Callable
from dataclasses import dataclass, field


class StepFailed(RuntimeError):
    def __init__(self, step: str, cause: Exception):
        super().__init__(f"step {step!r} failed after retries: {cause}")
        self.step = step
        self.cause = cause


class SensorTimeout(TimeoutError):
    pass


@dataclass
class Step:
    name: str
    fn: Callable[[dict], object]
    depends_on: list[str] = field(default_factory=list)
    retries: int = 1
    retry_delay_sec: float = 0.0


class Pipeline:
    """Dependency-ordered step execution with retries and callbacks.

    ``context`` accumulates step results under their names — the
    in-process replacement for XCom (cluster ids `:299`, step ids
    `:513`, query-execution ids `:358` in the reference).
    """

    def __init__(
        self,
        name: str,
        on_failure: Callable[[str, Exception], None] | None = None,
    ):
        self.name = name
        self.steps: dict[str, Step] = {}
        self.on_failure = on_failure

    def add_step(
        self,
        name: str,
        fn: Callable[[dict], object],
        depends_on: list[str] | None = None,
        retries: int = 1,
        retry_delay_sec: float = 0.0,
    ) -> "Pipeline":
        if name in self.steps:
            raise ValueError(f"duplicate step {name!r}")
        for dep in depends_on or []:
            if dep not in self.steps:
                raise ValueError(f"step {name!r} depends on unknown {dep!r}")
        self.steps[name] = Step(name, fn, list(depends_on or []), retries, retry_delay_sec)
        return self

    def _topo_order(self) -> list[Step]:
        order: list[Step] = []
        done: set[str] = set()
        pending = dict(self.steps)
        while pending:
            ready = [s for s in pending.values() if set(s.depends_on) <= done]
            if not ready:
                raise ValueError(f"dependency cycle among: {sorted(pending)}")
            for s in ready:
                order.append(s)
                done.add(s.name)
                del pending[s.name]
        return order

    def run(self, context: dict | None = None) -> dict:
        ctx = dict(context or {})
        for step in self._topo_order():
            last_err: Exception | None = None
            for attempt in range(step.retries + 1):
                try:
                    ctx[step.name] = step.fn(ctx)
                    last_err = None
                    break
                except Exception as e:  # noqa: BLE001 — retry boundary
                    last_err = e
                    if attempt < step.retries and step.retry_delay_sec:
                        time.sleep(step.retry_delay_sec)
            if last_err is not None:
                if self.on_failure:
                    self.on_failure(step.name, last_err)
                raise StepFailed(step.name, last_err)
        return ctx


def file_sensor(
    path_glob: str,
    timeout_sec: float = 60.0,
    poke_interval_sec: float = 0.5,
    min_files: int = 1,
) -> list[str]:
    """Poll until ≥min_files match (S3KeySensor with wildcard,
    etl_aws_vini.py:459-468, against any filesystem)."""
    deadline = time.monotonic() + timeout_sec
    while True:
        hits = glob.glob(path_glob)
        if len(hits) >= min_files:
            return sorted(hits)
        if time.monotonic() >= deadline:
            raise SensorTimeout(
                f"no files matched {path_glob!r} within {timeout_sec}s"
            )
        time.sleep(poke_interval_sec)


def reconcile_counts(expected: int, actual: int, label: str) -> int:
    """Cross-store row-count validation (Athena vs Postgres counts in
    the reference, `:244-256`) as a hard post-write assertion."""
    if expected != actual:
        raise AssertionError(
            f"count reconciliation failed for {label}: "
            f"expected {expected}, sink has {actual}"
        )
    return actual
