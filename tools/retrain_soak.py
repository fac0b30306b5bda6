"""sf0.1 incremental-retrain + compaction streaming soak (r12 verdict
order #6): drive classifier_retrain_foreach_batch with a REAL
Structured Streaming file source over the sf0.1 documents corpus —
wave / compact / flip loop — asserting the published model is
BIT-IDENTICAL to a one-pass full retrain after every wave and after
every compaction, that the stream continues across compactions with no
restart, that redelivery of the newest (un-folded) batch is a no-op,
and that redelivery of a folded batch fails loudly.

Usage: python tools/retrain_soak.py [--sf-dir /root/testdata/sf0.1]
                                    [--waves 6]

Emits a markdown evidence block; exits nonzero on any failed assertion.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--waves", type=int, default=6)
    args = ap.parse_args()

    from functools import reduce

    from meteo_etl_spark.functions.classify import (
        classifier_retrain_foreach_batch,
        compact_token_counts,
        load_model,
        model_from_counts,
        read_token_counts,
        train_token_centroids,
    )
    from meteo_etl_spark.session import get_spark
    from meteo_etl_spark.sources.testdata import load_table

    spark = get_spark("retrain-soak")
    docs = load_table(spark, args.sf_dir, "documents").select(
        "doc_id", "text", "lang"
    )
    n_docs = docs.count()
    n_waves = args.waves

    scratch = tempfile.mkdtemp(prefix="retrain_soak_")
    src = os.path.join(scratch, "feed")
    os.makedirs(src)
    counts = os.path.join(scratch, "counts")
    model_path = os.path.join(scratch, "model")
    ckpt = os.path.join(scratch, "ckpt")

    stats: list = []
    handler = classifier_retrain_foreach_batch(
        spark, counts, model_path, tag="prod", stats=stats
    )

    lines = [
        f"corpus: {args.sf_dir} — {n_docs} docs in {n_waves} waves "
        f"(doc_id % {n_waves})",
        "",
        "| step | wall (s) | batches on disk | model rows | check |",
        "|---|---|---|---|---|",
    ]

    def weights(df):
        return {(r["cls"], r["tok"]): r["freq_ppm"] for r in df.collect()}

    def full_retrain(upto_wave):
        parts = [waves_df[w] for w in range(upto_wave + 1)]
        return weights(
            train_token_centroids(reduce(lambda a, b: a.unionByName(b), parts))
        )

    def batch_dirs():
        return sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(counts)
            if d.startswith("batch=")
        )

    def run_stream():
        stream = spark.readStream.schema(
            "doc_id long, text string, lang string"
        ).json(src)
        q = (
            stream.writeStream.foreachBatch(handler)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    waves_df = {
        w: docs.filter(F.col("doc_id") % n_waves == w).cache()
        for w in range(n_waves)
    }
    rc = 0
    try:
        model_rows = 0
        # ---- wave loop with a compaction mid-stream -----------------
        for w in range(n_waves):
            rows = waves_df[w].collect()
            with open(os.path.join(src, f"wave{w}.json"), "w") as f:
                f.write(
                    "\n".join(
                        json.dumps(
                            {"doc_id": r.doc_id, "text": r.text, "lang": r.lang}
                        )
                        for r in rows
                    )
                )
            t0 = time.monotonic()
            run_stream()  # one new file -> one micro-batch; ids continue
            wall = time.monotonic() - t0
            got = weights(load_model(spark, model_path, tag="prod"))
            want = full_retrain(w)
            assert got == want, f"wave {w}: published model != full retrain"
            model_rows = len(got)
            lines.append(
                f"| wave {w} ({len(rows)} docs) | {wall:.1f} "
                f"| {batch_dirs()} | {model_rows} | bit-exact vs full |"
            )

            if w == n_waves // 2:
                # compact mid-stream: folds batches 0..w-1, keeps w
                t0 = time.monotonic()
                upto = compact_token_counts(spark, counts, keep_last=1)
                wall = time.monotonic() - t0
                assert upto == w - 1, (upto, w)
                derived = weights(
                    model_from_counts(read_token_counts(spark, counts))
                )
                assert derived == want, "post-compaction counts diverged"
                lines.append(
                    f"| compact #1 (upto={upto}) | {wall:.1f} "
                    f"| {batch_dirs()} | {len(derived)} | bit-exact vs full |"
                )

        # ---- second compaction (new generation) ---------------------
        t0 = time.monotonic()
        upto = compact_token_counts(spark, counts, keep_last=1)
        wall = time.monotonic() - t0
        assert upto == n_waves - 2, upto
        final_want = full_retrain(n_waves - 1)
        derived = weights(model_from_counts(read_token_counts(spark, counts)))
        assert derived == final_want, "gen-2 compaction diverged"
        gens = sorted(os.listdir(os.path.join(counts, "_compaction")))
        assert len(gens) == 1, gens  # old generation GC'd
        lines.append(
            f"| compact #2 (upto={upto}, {gens[0]}) | {wall:.1f} "
            f"| {batch_dirs()} | {len(derived)} | bit-exact vs full |"
        )

        # ---- redelivery: newest batch replays as a no-op ------------
        t0 = time.monotonic()
        handler(waves_df[n_waves - 1], n_waves - 1)
        wall = time.monotonic() - t0
        got = weights(load_model(spark, model_path, tag="prod"))
        assert got == final_want, "redelivery changed the model"
        lines.append(
            f"| redeliver batch {n_waves - 1} | {wall:.1f} "
            f"| {batch_dirs()} | {len(got)} | bit-exact (no-op) |"
        )

        # ---- redelivery of a FOLDED batch fails loudly ---------------
        try:
            handler(waves_df[1], 1)
            raise AssertionError("folded-batch redelivery did not raise")
        except RuntimeError as e:
            assert "already compacted" in str(e), e
        lines.append(
            "| redeliver folded batch 1 | — | — | — "
            "| RuntimeError (loud), as contracted |"
        )
    except AssertionError as e:
        rc = 1
        lines.append(f"| FAILED | — | — | — | {e} |")
    finally:
        for df in waves_df.values():
            df.unpersist()
        shutil.rmtree(scratch, ignore_errors=True)
    print("\n".join(lines))
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
