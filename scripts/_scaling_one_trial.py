"""One scaling trial (2-core + 8-core cold JVMs), appending JSON lines
to the file given as argv[1] — lets a session chunk the 5-trial
protocol into timeout-sized pieces; aggregated into BENCH/scaling.json
by the session that runs it (same max-over-trials math as
bench_scaling.main)."""

import importlib.util
import json
import os
import sys

_here = os.path.dirname(os.path.abspath(__file__))
spec = importlib.util.spec_from_file_location(
    "bench_scaling", os.path.join(_here, "bench_scaling.py"))
bs = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bs)

out_path, rows = sys.argv[1], 200_000
bs.ensure_input(rows)
with open(out_path, "a") as f:
    for cores in (2, 8):
        r = bs.run_once(cores, rows)
        f.write(json.dumps(r) + "\n")
        print(cores, round(r["sec"], 1), int(r["tokens_per_sec"]))
