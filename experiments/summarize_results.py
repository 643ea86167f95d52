"""Pretty-print the measurement chain's results (run after
experiments/run_all_when_healthy.sh completes).

  python experiments/summarize_results.py
"""

import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))


def _rows(path):
    if not os.path.exists(path):
        return []
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                out.append(json.loads(line))
            except json.JSONDecodeError:
                out.append({"unparsed": line[:120]})
    return out


def main():
    print("== variant_results.jsonl (iteration-kernel variants)")
    for r in _rows(os.path.join(HERE, "variant_results.jsonl")):
        print("  ", json.dumps(r))
    print("== secondary_results.jsonl (secondary workloads)")
    for r in _rows(os.path.join(HERE, "secondary_results.jsonl")):
        print("  ", json.dumps(r))
    bench = os.path.join(HERE, "bench_iter_result.txt")
    if os.path.exists(bench):
        print("== bench.py (headline)")
        with open(bench) as f:
            for line in f:
                if line.strip():
                    print("  ", line.rstrip())


if __name__ == "__main__":
    main()
