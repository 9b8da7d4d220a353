"""End-to-end pipeline parity vs a pandas-computed oracle on
reference-shaped fixtures, plus governance-log assertions (SURVEY §5c)."""

from __future__ import annotations

import csv
import os
import textwrap

import pandas as pd
import pytest

from strategicai_visibility_loop_etl_spark.plans.pipeline import (
    default_config,
    run_visibility_pipeline,
)


pytestmark = pytest.mark.sweep  # reference-parity pipeline + CLI end-to-end

FROG = """
Address,Status Code,Title 1,Word Count,Structured Data
https://e.com/a/,200,A,500,Article
https://e.com/b,200,B,300,
https://e.com/c?utm_source=x,301,C,100,Product
https://e.com/a,200,A-dup,501,Article
"""

GSC = """
Top pages,Clicks,Impressions,CTR,Position
/a/,100,1000,10%,1
/a,20,1000,2%,3
/b,50,2000,2.5%,2
"""

GA4 = """
Page path and screen class,Active users,Sessions,Engaged sessions
/a,10,20,15
/b,4,8,2
(not set),5,5,5
"""


@pytest.fixture()
def fixture_paths(tmp_path):
    paths = {}
    for name, content in (("frog.csv", FROG), ("gsc.csv", GSC), ("ga4.csv", GA4)):
        p = tmp_path / name
        p.write_text(textwrap.dedent(content).lstrip())
        paths[name.split(".")[0]] = str(p)
    return paths


def test_pipeline_parity_with_pandas_oracle(spark, fixture_paths, tmp_path, monkeypatch):
    monkeypatch.setenv("SITE_BASE", "https://e.com")
    monkeypatch.setenv("ETL_RUN_LOG", "0")
    monkeypatch.setenv("ETL_AUTODETECT_LOG", "0")
    cfg = default_config()
    cfg["inputs"] = {
        "screaming_frog": fixture_paths["frog"],
        "gsc": fixture_paths["gsc"],
        "ga4": fixture_paths["ga4"],
    }
    outs = run_visibility_pipeline(spark, cfg)
    merged = {r["url"]: r for r in outs["merged"].collect()}

    # Spine dedup: /a kept once (4 frog rows -> 3 urls).
    assert set(merged) == {"https://e.com/a", "https://e.com/b", "https://e.com/c"}

    # GSC aggregation oracle (pandas-computed semantics):
    # /a: clicks 120, impressions 2000, weighted pos (1*1000+3*1000)/2000 = 2.0
    a = merged["https://e.com/a"]
    assert a["clicks"] == 120.0
    assert a["impressions"] == 2000.0
    assert a["position"] == 2.0
    assert a["ctr"] == round(120.0 / 2000.0, 4)

    # GA4 joined: sessions/engaged -> engagement_rate 15/20
    assert a["sessions"] == 20.0
    assert a["engagement_rate"] == 0.75

    # click_share: /a 120 of 170 total
    assert a["click_share"] == round(120.0 / 170.0, 6)

    # Position-1 bucket expectations from default config: pos 2.0 -> bucket "2"
    assert a["expected_ctr_bucket"] == "2"
    assert a["expected_ctr"] == 0.2
    # deficit = 0.2 - 0.06 - 0.002 margin
    assert a["ctr_deficit"] == round(0.2 - 0.06 - 0.002, 4)
    assert a["missed_clicks"] == round((0.2 - 0.06 - 0.002) * 2000, 3)

    # /c has no GSC/GA4 data -> nulls, no crash
    c = merged["https://e.com/c"]
    assert c["clicks"] is None and c["sessions"] is None
    # ... and scoring NULL-PROPAGATES for the unjoined row, exactly
    # like pandas' NaN arithmetic (reference :820-843): Spark's
    # greatest() ignores nulls, so a naive greatest(diff, 0) would
    # score the row 0.0 instead of missing (r14 parity-drive find)
    assert c["ctr_deficit"] is None
    assert c["missed_clicks"] is None and c["missed_clicks_eff"] is None

    # anomaly slice ranked by missed clicks
    under = outs["ctr_underperf"].collect()
    assert [r["priority_rank"] for r in under] == list(range(1, len(under) + 1))
    assert under[0]["missed_clicks"] == max(r["missed_clicks"] for r in under)

    # schema gaps: /b has blank structured data
    gaps = {r["url"] for r in outs["schema_gaps"].collect()}
    assert gaps == {"https://e.com/b"}


def test_pipeline_governance_logs(spark, fixture_paths, tmp_path, monkeypatch):
    run_log = tmp_path / "logs" / "runs.csv"
    auto_log = tmp_path / "logs" / "auto.csv"
    monkeypatch.setenv("SITE_BASE", "https://e.com")
    monkeypatch.setenv("ETL_RUN_LOG", "1")
    monkeypatch.setenv("ETL_RUN_LOG_PATH", str(run_log))
    monkeypatch.setenv("ETL_AUTODETECT_LOG", "1")
    monkeypatch.setenv("ETL_AUTODETECT_LOG_PATH", str(auto_log))
    monkeypatch.setenv("RUN_ID", "testrun_1")
    cfg = default_config()
    cfg["inputs"] = {
        "screaming_frog_csv": fixture_paths["frog"],  # reference-style key names
        "gsc_csv": fixture_paths["gsc"],
        "ga4_csv": fixture_paths["ga4"],
    }
    run_visibility_pipeline(spark, cfg, out_dir=str(tmp_path / "out"))

    with open(run_log) as fh:
        rows = list(csv.DictReader(fh))
    assert len(rows) == 1
    assert rows[0]["run_id"] == "testrun_1"
    assert rows[0]["rows_merged"] == "3"
    assert rows[0]["frog_csv"] == "frog.csv"

    with open(auto_log) as fh:
        auto_rows = list(csv.DictReader(fh))
    assert {r["source"] for r in auto_rows} == {"screaming_frog", "gsc", "ga4"}
    gsc_row = next(r for r in auto_rows if r["source"] == "gsc")
    assert "url" in gsc_row["mapped_fields"].split(";")

    # parquet outputs written
    assert os.path.isdir(tmp_path / "out" / "merged")
    merged_back = pd.read_parquet(tmp_path / "out" / "merged")
    assert len(merged_back) == 3


def test_pipeline_csv_mirror(spark, fixture_paths, tmp_path, monkeypatch):
    """output.csv_mirror writes header'd CSV directories alongside
    parquet for the reference's downstream consumers."""
    monkeypatch.setenv("SITE_BASE", "https://e.com")
    cfg = default_config()
    cfg["inputs"] = {
        "screaming_frog": fixture_paths["frog"],
        "gsc": fixture_paths["gsc"],
        "ga4": fixture_paths["ga4"],
    }
    cfg["output"]["csv_mirror"] = True
    out = tmp_path / "out"
    run_visibility_pipeline(spark, cfg, out_dir=str(out))
    for name in ("merged", "ctr_underperf", "schema_gaps"):
        assert os.path.isdir(out / f"{name}_csv"), name
    back = spark.read.option("header", True).csv(str(out / "merged_csv"))
    assert back.count() == 3
    assert "url" in back.columns and "missed_clicks" in back.columns


def test_cli_entrypoint_runs_pipeline(spark, fixture_paths, tmp_path, monkeypatch, capsys):
    """`python -m strategicai_visibility_loop_etl_spark` front door: flags resolve
    inputs, the pipeline runs, parquet outputs land under --out."""
    from strategicai_visibility_loop_etl_spark.__main__ import main

    monkeypatch.setenv("SITE_BASE", "https://e.com")
    monkeypatch.setenv("ETL_RUN_LOG", "0")
    monkeypatch.setenv("ETL_AUTODETECT_LOG", "0")
    out = tmp_path / "cli_out"
    rc = main(
        [
            "--frog", fixture_paths["frog"],
            "--gsc", fixture_paths["gsc"],
            "--ga4", fixture_paths["ga4"],
            "--out", str(out),
            "--csv-mirror",
        ],
        spark=spark,
    )
    assert rc == 0
    assert os.path.isdir(out / "merged")
    assert os.path.isdir(out / "merged_csv")
    merged_back = pd.read_parquet(out / "merged")
    assert set(merged_back["url"]) == {
        "https://e.com/a", "https://e.com/b", "https://e.com/c",
    }
    assert "Merged rows: 3" in capsys.readouterr().out


def test_cli_env_precedence_and_missing_file(spark, fixture_paths, tmp_path, monkeypatch, capsys):
    """Env vars beat config (reference resolve_input_path precedence);
    a missing input is a clean [ERROR] + exit 1, like the reference."""
    from strategicai_visibility_loop_etl_spark.__main__ import main

    monkeypatch.setenv("SITE_BASE", "https://e.com")
    monkeypatch.setenv("ETL_RUN_LOG", "0")
    monkeypatch.setenv("ETL_AUTODETECT_LOG", "0")
    monkeypatch.setenv("FROG_CSV_PATH", fixture_paths["frog"])
    monkeypatch.setenv("GSC_CSV_PATH", fixture_paths["gsc"])
    monkeypatch.setenv("GA4_CSV_PATH", fixture_paths["ga4"])
    out = tmp_path / "env_out"
    rc = main(["--out", str(out)], spark=spark)
    assert rc == 0
    assert os.path.isdir(out / "merged")

    monkeypatch.setenv("FROG_CSV_PATH", str(tmp_path / "nope.csv"))
    rc = main(["--out", str(tmp_path / "x")], spark=spark)
    assert rc == 1
    assert "[ERROR] File not found for Screaming Frog" in capsys.readouterr().err


def test_cli_corpus_subcommand(spark, tmp_path, sf_dir):
    """`python -m strategicai_visibility_loop_etl_spark corpus` cleans a parquet
    documents table end-to-end."""
    from strategicai_visibility_loop_etl_spark.__main__ import main

    out = tmp_path / "corpus_out"
    rc = main(
        [
            "corpus",
            "--input", f"{sf_dir}/documents.parquet",
            "--out", str(out),
            "--min-tokens", "4",
            "--shards", "2",
        ],
        spark=spark,
    )
    assert rc == 0
    clean = pd.read_parquet(out / "clean")
    assert 0 < len(clean)
    assert {"lang", "quality", "n_tokens"} <= set(clean.columns)
    shards = pd.read_parquet(out / "shards")
    assert set(shards["shard"]) <= {0, 1}


def test_csv_mirror_bytes_match_pandas_rendering(spark, fixture_paths, tmp_path, monkeypatch):
    """The mirror must be byte-identical (modulo row order) to the
    reference's rendering mechanism — pandas ``to_csv(index=False,
    float_format="%.6f")`` over the same data with the reference's
    dtype contract: ratio/config columns float by construction, crawl
    ints Int64 by construction, raw metric sums inferred int64 when
    fully populated and integral."""
    import glob
    import io

    import pandas as pd

    monkeypatch.setenv("SITE_BASE", "https://e.com")
    monkeypatch.setenv("ETL_RUN_LOG", "0")
    monkeypatch.setenv("ETL_AUTODETECT_LOG", "0")
    cfg = default_config()
    cfg["inputs"] = {
        "screaming_frog": fixture_paths["frog"],
        "gsc": fixture_paths["gsc"],
        "ga4": fixture_paths["ga4"],
    }
    cfg["output"]["csv_mirror"] = True
    out = tmp_path / "out"
    run_visibility_pipeline(spark, cfg, out_dir=str(out))

    float_by_construction = {
        "ctr", "ctr_pct", "position", "expected_ctr", "expected_ctr_uplift",
        "ctr_deficit", "intent_multiplier", "missed_clicks", "missed_clicks_eff",
        "engagement_rate", "engagement_rate_pct", "click_share",
    }
    int_by_construction = {
        "status_code", "click_depth", "inlinks", "word_count",
        "avg_engagement_time", "run_timestamp",
    }
    pdf = pd.read_parquet(out / "merged")
    for c in pdf.columns:
        if c in int_by_construction:
            pdf[c] = pd.to_numeric(pdf[c], errors="coerce").astype("Int64")
        elif pdf[c].dtype.kind == "f" and c not in float_by_construction:
            # pandas' own inference: to_numeric yields int64 only for
            # fully-populated integral columns.
            if pdf[c].notna().all() and (pdf[c] % 1 == 0).all():
                pdf[c] = pdf[c].astype("int64")
    buf = io.StringIO()
    pdf.to_csv(buf, index=False, float_format="%.6f")
    exp_header, *exp_rows = buf.getvalue().splitlines()

    got_rows, got_header = [], None
    for part in glob.glob(str(out / "merged_csv" / "part-*")):
        with open(part) as fh:
            lines = fh.read().splitlines()
        got_header = lines[0]
        got_rows += lines[1:]
    assert got_header == exp_header
    assert sorted(got_rows) == sorted(exp_rows)
