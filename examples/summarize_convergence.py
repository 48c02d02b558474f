"""Summarize a convergence run's metrics.jsonl (results/r4 campaign).

Prints one JSON line: epochs run, best epoch/valid loss, final-epoch
recall@K, sustained pairs/s, and the per-phase epoch-tail attribution
(time/{train,valid,ckpt,eval}_s medians) that the round-4 Trainer emits.

Usage: python examples/summarize_convergence.py RUN/logs/metrics.jsonl
"""
import json
import statistics
import sys


def main() -> None:
    rows = [json.loads(l) for l in open(sys.argv[1])]
    val = [r["loss/val"] for r in rows]
    best = min(range(len(val)), key=val.__getitem__)
    out = {
        "epochs_run": len(rows),
        "best_epoch": rows[best].get("step", best),
        "best_valid_loss": round(val[best], 4),
        "final_train_loss": round(rows[-1]["loss/train"], 4),
        "sustained_pairs_per_s": round(statistics.median(
            r["throughput/examples_per_sec_per_chip"] for r in rows[1:])
            if len(rows) > 1 else rows[0][
                "throughput/examples_per_sec_per_chip"], 1),
    }
    evals = [r for r in rows if "eval/recall@1" in r]
    if evals:
        last = evals[-1]
        out["last_eval_epoch"] = last.get("step")
        for k in ("eval/recall@1", "eval/recall@5", "eval/recall@10"):
            if k in last:
                out[k] = last[k]
        # Eval row nearest the best-valid epoch (eval_every-gated runs may
        # not have one exactly there; the `cli eval` battery on the best
        # checkpoint is the definitive converged number).
        near = min(evals, key=lambda r: abs(r.get("step", 0)
                                            - out["best_epoch"]))
        out["best_near_eval_epoch"] = near.get("step")
        for k in ("eval/recall@1", "eval/recall@5", "eval/recall@10"):
            if k in near:
                out[k.replace("eval/", "best_near_")] = near[k]
    for key in ("time/train_s", "time/valid_s", "time/ckpt_s",
                "time/eval_s"):
        vals = [r[key] for r in rows if key in r]
        if vals:
            out[key + "_median"] = round(statistics.median(vals), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
