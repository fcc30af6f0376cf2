"""Regenerate the committed driver-window manifest in ``queries.py``.

The driver's correctness gate covers the FIRST 50 ``catalog()`` entries
per round.  This tool prints the next round's 50-name window:

* a SENTINEL head you pass on the command line (headline queries plus
  every query whose code or oracle changed this round), then
* the least-recently-driver-checked queries (ordered by the round of
  their latest CORRECTNESS_r*.json row, registration order within a
  round) so the window keeps rotating over the whole catalog.

Paste the output over ``_DRIVER_WINDOW_R<n>`` in
``datafusion_monoid_spark/queries.py`` and commit — catalog order is a
committed artifact, never derived from filesystem state at call time
(ADVICE r3).

Usage::

    python tools/gen_driver_window.py tpch_q1 monoid_sum_double ...
"""

from __future__ import annotations

import glob
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    from datafusion_monoid_spark import queries as qcat

    sentinels = sys.argv[1:]
    # CREDIT RULE (the round-6 failure mode): staleness ordering comes
    # ONLY from CORRECTNESS_r*.json files actually present in the
    # checkout.  A round whose artifact was never written back gets no
    # credit — its entries sort as never-checked and lead the window;
    # an unreadable artifact is a hard error, not a silent skip.
    seen: dict[str, str] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            data = json.load(f)
        if not isinstance(data, dict):
            sys.exit(f"malformed correctness artifact: {path}")
        for name in data:
            seen[name] = os.path.basename(path)

    names = list(qcat._CATALOG)
    order = {n: i for i, n in enumerate(names)}
    unknown = [s for s in sentinels if s not in order]
    if unknown:
        sys.exit(f"unknown sentinel queries: {unknown}")
    rest = sorted((n for n in names if n not in sentinels),
                  key=lambda n: (seen.get(n, ""), order[n]))
    window = sentinels + rest[:50 - len(sentinels)]
    print(json.dumps(window, indent=2))


if __name__ == "__main__":
    main()
