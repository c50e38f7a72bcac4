"""Per-query bench delta between two Bench JSON lines (judge item: keep
round-over-round totals honest as the sweep grows). Usage:

    python3 tools/bench_delta.py BENCH_r02.json /tmp/bench_r03.json

Prints a markdown table: per-query seconds in each round, the delta, and
NEW/GONE markers, plus same-query subtotals so totals compare
like-for-like even when the sweep grew."""
import json, sys

def load(p):
    with open(p) as f:
        d = json.load(f)
    if "queries" in d:
        return d
    # driver-written BENCH_r*.json wraps the bench line under "parsed",
    # with a possibly head-truncated copy in "tail" — recover the object
    # by scanning for the queries payload
    if d.get("parsed") is not None:
        return d["parsed"]
    tail = d["tail"]
    start = tail.find('"queries"')
    if start < 0:
        sys.exit(f"{p}: queries payload not recoverable from truncated 'tail'")
    obj = "{" + tail[start:]
    if not obj.endswith("}"):
        obj = obj[: obj.rfind("}") + 1]
    rec = json.loads(obj)
    # salvage the headline fields from the raw text
    import re
    m = re.search(r'"value":([0-9.]+)', tail)
    rec.setdefault("value", float(m.group(1)) if m else float("nan"))
    m = re.search(r'"kg_docs_per_sec":([0-9.]+)', tail)
    rec["kg_docs_per_sec"] = float(m.group(1)) if m else float("nan")
    return rec

def main(a_path, b_path):
    a, b = load(a_path), load(b_path)
    qa, qb = a["queries"], b["queries"]
    names = sorted(set(qa) | set(qb), key=lambda n: -(qb.get(n, qa.get(n, 0))))
    print("| query | %s (s) | %s (s) | delta |" % (a_path.split("/")[-1], b_path.split("/")[-1]))
    print("|---|---|---|---|")
    for n in names:
        if n not in qa:
            print("| %s | — | %.2f | NEW |" % (n, qb[n]))
        elif n not in qb:
            print("| %s | %.2f | — | GONE |" % (n, qa[n]))
        else:
            d = qb[n] - qa[n]
            print("| %s | %.2f | %.2f | %+.2f |" % (n, qa[n], qb[n], d))
    shared = set(qa) & set(qb)
    sa = sum(qa[n] for n in shared)
    sb = sum(qb[n] for n in shared)
    print()
    print("shared-query subtotal: %.1f s -> %.1f s (%+.1f s over %d queries)"
          % (sa, sb, sb - sa, len(shared)))
    print("new-query cost: %.1f s over %d queries"
          % (sum(qb[n] for n in qb if n not in qa), len(set(qb) - set(qa))))
    print("full totals: %.1f s (%d q) -> %.1f s (%d q)"
          % (a["value"], len(qa), b["value"], len(qb)))
    print("kg_docs_per_sec: %.0f -> %.0f" % (a["kg_docs_per_sec"], b["kg_docs_per_sec"]))

if __name__ == "__main__":
    if len(sys.argv) != 3:
        sys.exit("usage: bench_delta.py <old_bench.json> <new_bench.json>")
    main(sys.argv[1], sys.argv[2])
