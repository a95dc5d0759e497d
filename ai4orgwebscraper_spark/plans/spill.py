"""Budget-aware spill-directory selection, shared by every iterative
spill site (``CrawlEngine._spill`` and ``plans.iterate.spill_loop``).

tmpfs ($SPARK_GRAFT_STATE_DIR, default /dev/shm) is the fast path for
lineage-truncation spills, but it is RAM-backed: unbounded iterative
state (a 10^9-node connected-components/PageRank loop) would ENOSPC it
mid-run. Budget = half the backing filesystem's free space at
construction (override: $SPARK_GRAFT_SPILL_BUDGET_BYTES); once LIVE
spill bytes cross it, later spills land on a disk-backed overflow dir
(sticky — files already written stay put, still referenced by live
lineage). Sites that delete superseded steps (spill_loop's two-back
deletion) return the freed bytes to the budget, so the accounting
tracks live state, not cumulative writes.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile


def _tree_bytes(path: str) -> int:
    try:
        return sum(e.stat().st_size for e in os.scandir(path) if e.is_file())
    except OSError:
        return 0


class BudgetedSpillDir:
    def __init__(self, prefix: str):
        base = os.environ.get("SPARK_GRAFT_STATE_DIR") or (
            "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
        )
        self.primary = tempfile.mkdtemp(prefix=prefix, dir=base)
        # leak guard for sites never cleanup()d (tests, notebooks);
        # spilled state may outlive the loop (returned DataFrames read
        # from the last spill), so eager cleanup is the CALLER's call
        atexit.register(shutil.rmtree, self.primary, ignore_errors=True)
        self.live_bytes = 0
        try:
            st = os.statvfs(self.primary)
            self.budget = int(
                os.environ.get(
                    "SPARK_GRAFT_SPILL_BUDGET_BYTES", st.f_bavail * st.f_frsize // 2
                )
            )
        except OSError:
            self.budget = 1 << 34  # 16 GiB fallback
        self.overflow: str | None = None
        self._prefix = prefix

    def next_dir(self) -> str:
        """Directory the next spill should land in (sticky overflow)."""
        return self.overflow or self.primary

    def note_written(self, path: str) -> None:
        """Account a finished spill; engage the disk overflow dir once
        live bytes cross the tmpfs budget."""
        self.live_bytes += _tree_bytes(path)
        if self.overflow is None and self.live_bytes > self.budget:
            self.overflow = tempfile.mkdtemp(
                prefix=f"{self._prefix}overflow_", dir=tempfile.gettempdir()
            )
            atexit.register(shutil.rmtree, self.overflow, ignore_errors=True)

    def delete(self, path: str) -> None:
        """Remove a superseded spill and return its bytes to the budget."""
        self.live_bytes = max(0, self.live_bytes - _tree_bytes(path))
        shutil.rmtree(path, ignore_errors=True)

    def cleanup(self) -> None:
        shutil.rmtree(self.primary, ignore_errors=True)
        if self.overflow:
            shutil.rmtree(self.overflow, ignore_errors=True)
