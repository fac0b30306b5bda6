"""Dashboard analytics parity (pandas describe as the oracle —
reference `dashboard/streamlit_app.py:67-79`) and the CLI surface."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from meteo_etl_spark import cli
from meteo_etl_spark.errors import TransformError
from meteo_etl_spark.pipeline import batch
from meteo_etl_spark.pipeline.warehouse import read_observations
from meteo_etl_spark.plans import analytics
from tests.conftest import N_HOURS, golden_payload


@pytest.fixture()
def offline_source(monkeypatch):
    from meteo_etl_spark.sources.registry import Source

    calls = {"n": 0}

    def extract(self, **extra):
        calls["n"] += 1
        # two distinct locations across calls
        return golden_payload(lat=3.06 + calls["n"], lon=5.25)

    monkeypatch.setattr(Source, "extract", extract)


@pytest.fixture()
def seeded(spark, warehouse, offline_source):
    for _ in range(2):
        batch.run_etl(spark, warehouse, "meteo", {"latitude": 1.0, "longitude": 2.0})
    return warehouse


def test_counts(spark, seeded):
    obs_n, meta_n, loc_n = analytics.get_counts(spark, seeded)
    assert obs_n == 2 * N_HOURS
    assert meta_n == 2
    assert loc_n == 2


def test_describe_matches_pandas(spark, seeded):
    """Engine-side describe() == pandas describe() (count, mean, std,
    min, linear-interpolated quartiles, max)."""
    pdf = read_observations(spark, seeded).toPandas()
    expected = pdf[list(analytics.SUMMARY_COLS)].describe()
    got = {r.measure: r for r in analytics.describe_observations(spark, seeded).collect()}

    for m in analytics.SUMMARY_COLS:
        e, g = expected[m], got[m]
        assert g["count"] == e["count"]
        for stat, key in [
            ("mean", "mean"), ("std", "std"), ("min", "min"),
            ("25%", "p25"), ("50%", "p50"), ("75%", "p75"), ("max", "max"),
        ]:
            assert math.isclose(g[key], e[stat], rel_tol=1e-9), (m, stat)


def test_mean_tiles_rounding(spark, seeded):
    pdf = read_observations(spark, seeded).toPandas()
    tiles = analytics.mean_tiles(spark, seeded)
    for m in analytics.SUMMARY_COLS:
        assert tiles[m] == pytest.approx(round(pdf[m].mean(), 2), abs=5e-3)


def test_last_job_status_label(spark, seeded):
    assert analytics.last_job_status(spark, seeded) == "🟢 Success"


def test_last_job_status_empty(spark, warehouse):
    assert analytics.last_job_status(spark, warehouse) is None


def test_parse_cli_params():
    assert cli.parse_cli_params(["a=1", "b=x=y"]) == {"a": "1", "b": "x=y"}
    with pytest.raises(TransformError, match="expected <key>=<value>"):
        cli.parse_cli_params(["noequals"])


def test_cli_fetch_and_store_then_dashboard(
    spark, warehouse, offline_source, capsys
):
    rc = cli.main(
        ["--warehouse", warehouse.root, "fetch-and-store",
         "--long", "5.25", "--lat", "3.06", "-p", "forecast_days=7"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "status=success" in out

    rc = cli.main(["--warehouse", warehouse.root, "dashboard"])
    assert rc == 0
    out = capsys.readouterr().out
    assert f"Observations recorded: {N_HOURS}" in out
    assert "Last status recorded: 🟢 Success" in out


def test_cli_fetch_prints_json_lines(spark, warehouse, offline_source, capsys):
    rc = cli.main(
        ["fetch", "--long", "5.25", "--lat", "3.06", "--no-pretty"]
    )
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    assert len(lines) == N_HOURS


def test_cli_optimize_and_vacuum_maintenance(spark, tmp_path, capsys):
    """The table-maintenance entry points: OPTIMIZE compacts fragmented
    partitions of an atomic table as one commit; VACUUM collects the
    superseded generations afterwards (explicit, never implicit)."""
    from meteo_etl_spark.operators.atomic import AtomicParquetTable, read_table

    path = str(tmp_path / "t")
    t = AtomicParquetTable(spark, path, partition_col="p")
    base = spark.createDataFrame(
        [(j, f"v{j}", "a" if j % 2 == 0 else "b") for j in range(40)],
        ["k", "v", "p"],
    )
    t.overwrite(base.repartition(6))

    rc = cli.main(["optimize", "--path", path, "--partition-col", "p",
                   "--min-files", "1"])
    assert rc == 0
    assert "partitions_compacted=2" in capsys.readouterr().out
    assert read_table(spark, path).count() == 40
    assert t.versions() == [1, 2]  # OPTIMIZE alone keeps history

    rc = cli.main(["vacuum", "--path", path, "--min-orphan-age-seconds", "0"])
    assert rc == 0
    assert "removed=1" in capsys.readouterr().out
    assert t.versions() == [2]
    assert read_table(spark, path).count() == 40

    rc = cli.main(["vacuum", "--path", str(tmp_path / "nope")])
    assert rc == 1


def test_cli_database_deployment_flags(
    spark, warehouse, offline_source, tmp_path, capsys
):
    """--control-jdbc-url + --jdbc-sink-url drive the keep-Postgres
    deployment end-to-end from the CLI: publish with db control, then
    consume into a db observations table."""
    from meteo_etl_spark.sources import jdbc

    if not jdbc.driver_available(spark, jdbc.DERBY_DRIVER):
        pytest.skip("Derby driver not on JVM classpath")
    url = f"jdbc:derby:{tmp_path}/clidb;create=true"
    topic = str(tmp_path / "topic")

    rc = cli.main(
        ["--warehouse", warehouse.root, "--control-jdbc-url", url,
         "fetch-and-publish", "--long", "5.25", "--lat", "3.06",
         "--topic-dir", topic]
    )
    assert rc == 0
    assert "status=success" in capsys.readouterr().out

    rc = cli.main(
        ["--warehouse", warehouse.root, "--control-jdbc-url", url,
         "consume-fetch-events", "--topic-dir", topic,
         "--checkpoint", str(tmp_path / "ckpt"), "--jdbc-sink-url", url]
    )
    assert rc == 0
    assert f"merged_rows={N_HOURS}" in capsys.readouterr().out
    assert jdbc.read_jdbc(spark, url, "observations").count() == N_HOURS
    assert jdbc.read_jdbc(spark, url, "fetch_metadata").count() == 1


def test_cli_optimize_bloom_filter_flag(spark, tmp_path, capsys):
    """--bloom-filter-by threads through to the rewrite: every
    compacted file carries a bloom filter on the listed column."""
    import os

    from meteo_etl_spark.operators.compact import bloom_filter_offset

    path = str(tmp_path / "t")
    df = spark.range(0, 500).withColumnRenamed("id", "k")
    for i in range(3):
        df.filter(F.col("k") % 3 == i).write.mode("append").parquet(path)

    rc = cli.main(["optimize", "--path", path, "--min-files", "1",
                   "--bloom-filter-by", "k"])
    assert rc == 0
    assert "partitions_compacted=1" in capsys.readouterr().out
    files = [os.path.join(r, f) for r, _d, fs in os.walk(path)
             for f in fs if f.endswith(".parquet")]
    assert files and all(bloom_filter_offset(spark, f, "k") >= 0 for f in files)


def test_cli_analyze_prints_stats(spark, tmp_path, capsys):
    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "aa", None), (2, "bbbb", "x")], ["id", "s", "maybe"]
    ).write.parquet(path)
    rc = cli.main(["analyze", "--path", path, "--ndv-by", "id"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "rows=2" in out
    assert "column maybe:" in out and "nulls=1" in out
    assert "ndv~" in out
    # persisted sidecar feeds the broadcast advisor
    from meteo_etl_spark.operators.stats import load_stats

    st = load_stats(path)
    assert st is not None and st.rows == 2


def test_cli_tokenizer_train_writes_merges(spark, tmp_path, capsys):
    corpus = str(tmp_path / "docs")
    spark.createDataFrame(
        [("low low low lower",), ("newest newest new",)], ["text"]
    ).write.parquet(corpus)
    out = str(tmp_path / "merges.jsonl")
    rc = cli.main(
        ["tokenizer-train", "--path", corpus, "--out", out,
         "--merges", "4", "--min-pair-count", "2"]
    )
    assert rc == 0
    import json as _json

    lines = [_json.loads(l) for l in open(out, encoding="utf-8")]
    assert lines and lines[0]["rank"] == 0
    assert all(m["merged"] == m["a"] + m["b"] for m in lines)
    assert all(m["pair_count"] >= 2 for m in lines)
    assert f"merges={len(lines)}" in capsys.readouterr().out


def test_cli_tag_lifecycle(spark, tmp_path, capsys):
    from meteo_etl_spark.operators.atomic import AtomicParquetTable

    path = str(tmp_path / "t")
    t = AtomicParquetTable(spark, path)
    t.overwrite(spark.createDataFrame([(1,)], ["k"]))            # v1
    assert cli.main(["tag", "--path", path, "--name", "rel"]) == 0
    t.overwrite(spark.createDataFrame([(2,)], ["k"]))            # v2
    assert cli.main(["tag", "--path", path, "--list"]) == 0
    out = capsys.readouterr().out
    assert "rel\tv1" in out
    assert cli.main(
        ["tag", "--path", path, "--name", "rel", "--replace"]
    ) == 0
    assert cli.main(["tag", "--path", path, "--name", "rel", "--delete"]) == 0
    assert t.tags() == {}
    assert cli.main(["tag", "--path", str(tmp_path / "nope"), "--name", "x"]) == 1


def test_unigram_train_cli_writes_model(spark, tmp_path, capsys):
    src = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, "aa bb aa cc"), (2, "aa bb dd"), (3, "cc dd aa")],
        "doc_id long, text string",
    ).write.parquet(src)
    out = str(tmp_path / "vocab.jsonl")
    rc = cli.main(
        ["unigram-train", "--path", src, "--out", out, "--vocab-size", "16"]
    )
    assert rc == 0
    import json

    rows = [json.loads(line) for line in open(out)]
    assert rows and all(
        set(r) == {"piece", "freq", "cost_u"} for r in rows
    )
    pieces = {r["piece"] for r in rows}
    # the alphabet is always present; costs are positive integers
    assert {"a", "b", "c", "d"} <= pieces
    assert all(isinstance(r["cost_u"], int) and r["cost_u"] > 0 for r in rows)
    assert "pieces=" in capsys.readouterr().out


def test_convert_cli_roundtrips_through_orc_and_csv(spark, tmp_path, capsys):
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, "x", 1.5), (2, "y,z", None)], "id long, s string, v double"
    ).write.parquet(src)
    orc = str(tmp_path / "orc")
    rc = cli.main(
        ["convert", "--src", src, "--dest", orc, "--dest-format", "orc"]
    )
    assert rc == 0
    assert "rows=2" in capsys.readouterr().out
    # and orc -> csv with the schema borrowed from the parquet source
    csvp = str(tmp_path / "csv")
    rc = cli.main(
        [
            "convert",
            "--src",
            orc,
            "--src-format",
            "orc",
            "--dest",
            csvp,
            "--dest-format",
            "csv",
        ]
    )
    assert rc == 0
    from meteo_etl_spark.sources.formats import read_table_as

    back = read_table_as(
        spark, csvp, "csv", like=spark.read.parquet(src)
    )
    assert sorted(map(tuple, back.collect()), key=repr) == sorted(
        map(tuple, spark.read.parquet(src).collect()), key=repr
    )


def test_cli_ann_delete_and_compact(spark, tmp_path, capsys):
    """The ANN maintenance surface: ann-delete tombstones ids (served
    results drop them at the next query), ann-compact folds committed
    generations and reports its plan stats as one JSON line."""
    import json

    from pyspark.sql import functions as F

    from meteo_etl_spark.functions import similarity as sim
    from meteo_etl_spark.sources.testdata import load_table
    from tests.conftest import SF_SMALL

    emb = load_table(spark, SF_SMALL, "embeddings")
    idx = str(tmp_path / "cliidx")
    handler = sim.lsh_ingest_foreach_batch(spark, idx)
    for w in range(3):
        handler(
            emb.filter(F.col("vec_id") % 3 == w).select("vec_id", "embedding"),
            w,
        )
    qv = [
        float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0].embedding
    ]
    top = sim.query_lsh_index(spark, idx, qv, k=3, exclude_id=0).collect()
    doomed = [r["vec_id"] for r in top[:2]]

    rc = cli.main(
        ["ann-delete", "--path", idx, "--ids", ",".join(map(str, doomed))]
    )
    assert rc == 0
    assert "tombstoned=2" in capsys.readouterr().out
    served = {
        r["vec_id"]
        for r in sim.query_lsh_index(spark, idx, qv, k=3, exclude_id=0).collect()
    }
    assert not served & set(doomed)

    rc = cli.main(["ann-compact", "--path", idx])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["folded"] == [0, 1] and stats["newgen"] == -1
    served2 = {
        r["vec_id"]
        for r in sim.query_lsh_index(spark, idx, qv, k=3, exclude_id=0).collect()
    }
    assert served2 == served
