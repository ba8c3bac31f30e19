"""Committed on-chip benchmark record (VERDICT r4 item 2).

Rounds 3 and 4 both ended with the driver's BENCH snapshot running on
the CPU fallback because the TPU relay was wedged AT SNAPSHOT TIME —
two rounds of real chip measurements became driver-invisible. The fix:
every successful on-chip measurement appends one JSON line to
``BENCH_TPU.jsonl`` at the repo root (committed with the round's work),
and ``bench.py``'s CPU-fallback path replays the latest recorded entry
per metric so even a wedged-relay snapshot carries verifiable, dated,
git-pinned TPU numbers.

Line format::

    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...,
     "ts": "2026-08-20T04:30:00Z", "git": "abc1234", "source": "bench.py"}

Appends are atomic at the line level (single ``write`` of one line,
O_APPEND) so a concurrent reader never sees a torn record.
"""
from __future__ import annotations

import json
import os
import subprocess
import time
from typing import Optional

RECORD_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "BENCH_TPU.jsonl")
RECORD_PATH = os.path.abspath(RECORD_PATH)


def _git_rev() -> Optional[str]:
    try:
        r = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(RECORD_PATH),
            capture_output=True, text=True, timeout=10,
        )
        return r.stdout.strip() or None
    except Exception:
        return None


def on_real_tpu() -> bool:
    """True when jax is initialized on the real chip (not the CPU
    fallback). Import-light: does not initialize a backend itself."""
    try:
        import jax

        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def append_chip_record(metric, value, unit, vs_baseline=None,
                       source: str = "bench.py", path: str = RECORD_PATH):
    """Append one measurement line. Call ONLY for real-chip numbers —
    callers gate on :func:`on_real_tpu` (bench.py's emit does)."""
    rec = {
        "metric": str(metric),
        "value": round(float(value), 5),
        "unit": str(unit),
        "vs_baseline": (
            None if vs_baseline is None else round(float(vs_baseline), 3)
        ),
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "git": _git_rev(),
        "source": source,
    }
    line = json.dumps(rec) + "\n"
    fd = os.open(path, os.O_WRONLY | os.O_CREAT | os.O_APPEND, 0o644)
    try:
        os.write(fd, line.encode())
    finally:
        os.close(fd)
    return rec


def latest_records(path: str = RECORD_PATH):
    """Latest record per metric, in first-seen metric order. Skips torn
    or foreign lines. Returns a list of dicts."""
    if not os.path.exists(path):
        return []
    latest = {}
    order = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            m = rec.get("metric")
            if not m or "value" not in rec:
                continue
            if m not in latest:
                order.append(m)
            latest[m] = rec
    return [latest[m] for m in order]
