"""5-second VM-quietness probe: pinned pure-CPU Mops at 4 and 16 procs.

The sandbox VM swings 3x between quiet and contended windows (identical
1.2M-turn builds measured 30 s and 89 s hours apart). Run this before an
evidentiary scaling run; compare against the quiet-window reference
printed below. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.scaling_bench import _spin_mops  # noqa: E402

# quiet-window reference (2026-08-17 15:35 run): 4 procs ~65 Mops,
# 16 procs ~231 Mops. Contended windows read far lower and noisier.
QUIET_4 = 65.0

if __name__ == "__main__":
    m4 = _spin_mops(4)
    m16 = _spin_mops(16)
    print(
        json.dumps(
            {
                "mops_4": round(m4, 1),
                "mops_16": round(m16, 1),
                "scaling_4_to_16": round(m16 / m4 / 4.0, 3),
                "vs_quiet_ref": round(m4 / QUIET_4, 2),
            }
        )
    )
