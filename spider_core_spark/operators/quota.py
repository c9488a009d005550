"""Resource quotas — the ResourceQuotaManager analog (reference
src/concurrency.rs:142-236, the crate's one unit-tested component besides
the AdaptiveSemaphore, test at :220-236).

Two layers:

- ``ResourceQuotaManager``: the reference API verbatim (total pool,
  allocate/release per component, error when a request exceeds the
  remainder) — driver-side bookkeeping for anything the engine wants to
  meter (e.g. broadcast budget, concurrent commit slots).
- ``over_quota_hosts``: the distributed application — per-host cumulative
  downloaded bytes accumulated across epochs in a usage table; hosts past
  the quota get budget 0 in select_wave (they stop being scheduled, the
  crawl-level analog of an exhausted allocation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class QuotaExceeded(Exception):
    pass


class ResourceQuotaManager:
    """Mirror of the reference semantics (src/concurrency.rs:152-199):
    allocate() errors when the request exceeds the unallocated remainder;
    release() frees a component's whole allocation; re-allocating a
    component replaces its recorded amount (DashMap::insert)."""

    def __init__(self, total_resources: int):
        self.total_resources = total_resources
        self._allocated = 0
        self._components: dict[str, int] = {}

    def allocate_resources(self, component: str, amount: int) -> int:
        if self._allocated + amount > self.total_resources:
            raise QuotaExceeded(
                f"Insufficient resources: requested {amount}, available "
                f"{self.total_resources - self._allocated}"
            )
        self._allocated += amount
        self._components[component] = amount
        return amount

    def release_resources(self, component: str) -> None:
        amount = self._components.pop(component, None)
        if amount is not None:
            self._allocated = max(self._allocated - amount, 0)

    def available_resources(self) -> int:
        return self.total_resources - self._allocated

    def get_allocation(self, component: str) -> int | None:
        return self._components.get(component)


def accumulate_usage(
    prev_usage: DataFrame | None, epoch_bytes: DataFrame
) -> DataFrame:
    """Merge an epoch's (host, bytes) into the running usage table —
    map-side-combinable groupBy, usage stays a table (never driver state,
    host cardinality is unbounded at crawl scale)."""
    cur = epoch_bytes.select("host", F.col("bytes").cast("long").alias("bytes"))
    if prev_usage is not None:
        cur = prev_usage.select("host", "bytes").unionByName(cur)
    return cur.groupBy("host").agg(F.sum("bytes").alias("bytes"))


def over_quota_hosts(usage: DataFrame, quota_bytes: int) -> DataFrame:
    """(host, budget=0) rows for hosts whose cumulative bytes exceed the
    quota — merged into select_wave's budgets via least()."""
    return usage.filter(F.col("bytes") >= quota_bytes).select(
        "host", F.lit(0).cast("int").alias("budget")
    )
