"""Memory governor (reference memory.rs): computes an allocation budget from
available system memory (cgroup-aware) and a configured limit, publishing
Can/Cannot to the index actors. Adds are dropped under pressure rather than
OOMing the process; ScyllaDB remains the source of truth.

limit = min(config_limit, available - max(1% of total, 200 MB))
(memory.rs:23-25,149-159)
"""

from __future__ import annotations

import asyncio
import logging
import os

logger = logging.getLogger(__name__)

RESERVE_FRACTION = 0.01
RESERVE_MIN_BYTES = 200 * 1024 * 1024
CHECK_INTERVAL = 1.0


def _read_meminfo() -> tuple[int, int]:
    """(total_bytes, available_bytes) from /proc/meminfo."""
    total = avail = 0
    with open("/proc/meminfo") as f:
        for line in f:
            if line.startswith("MemTotal:"):
                total = int(line.split()[1]) * 1024
            elif line.startswith("MemAvailable:"):
                avail = int(line.split()[1]) * 1024
    return total, avail


def _cgroup_limit() -> int | None:
    for path in ("/sys/fs/cgroup/memory.max", "/sys/fs/cgroup/memory/memory.limit_in_bytes"):
        try:
            raw = open(path).read().strip()
            if raw != "max":
                v = int(raw)
                if v < 1 << 60:
                    return v
        except (OSError, ValueError):
            continue
    return None


def _cgroup_current() -> int | None:
    for path in ("/sys/fs/cgroup/memory.current", "/sys/fs/cgroup/memory/memory.usage_in_bytes"):
        try:
            return int(open(path).read().strip())
        except (OSError, ValueError):
            continue
    return None


class MemoryGovernor:
    def __init__(self, limit_bytes: int | None = None) -> None:
        self.config_limit = limit_bytes
        self.can_allocate = True
        self._task: asyncio.Task | None = None
        self._stopped = False
        self.check()

    def check(self) -> bool:
        try:
            total, avail = _read_meminfo()
            cg_limit = _cgroup_limit()
            cg_cur = _cgroup_current()
            if cg_limit is not None and cg_cur is not None:
                total = min(total, cg_limit)
                avail = min(avail, cg_limit - cg_cur)
            reserve = max(int(total * RESERVE_FRACTION), RESERVE_MIN_BYTES)
            budget = avail - reserve
            if self.config_limit is not None:
                used = total - avail
                budget = min(budget, self.config_limit - used)
            self.can_allocate = budget > 0
        except OSError:
            logger.warning("memory governor: failed to read memory info")
            self.can_allocate = True
        return self.can_allocate

    def start(self) -> None:
        self._task = asyncio.get_running_loop().create_task(self._run())

    async def stop(self) -> None:
        self._stopped = True
        if self._task:
            self._task.cancel()
            try:
                await self._task
            except (asyncio.CancelledError, Exception):
                pass

    async def _run(self) -> None:
        while not self._stopped:
            await asyncio.sleep(CHECK_INTERVAL)
            was = self.can_allocate
            now = self.check()
            if was and not now:
                logger.warning("memory limit reached: new vectors will be dropped")
            elif now and not was:
                logger.info("memory pressure relieved: accepting vectors again")
