"""Regenerate COVERAGE.md's driver-signal ledger from queries() order and
the CORRECTNESS_r*.json artifacts. Run from the repo root after adding or
reordering driver queries."""
import json
import glob
import re
import sys

sys.path.insert(0, ".")
import __spark_entry__ as e  # noqa: E402

keys = list(e.queries())
rounds = sorted(
    int(p.split("_r")[-1].split(".")[0]) for p in glob.glob("CORRECTNESS_r*.json")
)
checks: dict[str, dict[int, str]] = {}
for rnd in rounds:
    d = json.load(open(f"CORRECTNESS_r{rnd:02d}.json"))
    for k, v in d.items():
        if v.get("rows_match") and v.get("hash_match"):
            mark = "✓"
        else:
            err = (v.get("err") or "").strip()
            mark = "no_oracle" if "no_oracle" in err else "err"
        checks.setdefault(k, {})[rnd] = mark

header = (
    "| # | query key | " + " | ".join(f"r{r}" for r in rounds)
    + f" | in r{rounds[-1] + 1} window |\n|---|---|" + "---|" * (len(rounds) + 1)
)
rows = [header]
for i, k in enumerate(keys, 1):
    marks = [checks.get(k, {}).get(r, "—") for r in rounds]
    rows.append(
        f"| {i} | `{k}` | {' | '.join(marks)} | {'yes' if i <= 50 else 'no'} |"
    )
table = "\n".join(rows) + "\n"

cov = open("COVERAGE.md").read()
start = cov.index("| # | query key |")
# Replace only the contiguous table block; keep every section after it.
end = start
while end < len(cov):
    nl = cov.find("\n", end)
    if nl == -1:
        end = len(cov)
        break
    if not cov[end:nl].startswith("|"):
        break
    end = nl + 1
cov = cov[:start] + table + cov[end:]
open("COVERAGE.md", "w").write(cov)
print(f"ledger regenerated: {len(keys)} keys, rounds {rounds}")
