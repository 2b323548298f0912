"""Unit tests for bench.collect_gates — the --enforce decision logic,
factored out of main() so a gating hole (like the stanza-wholesale-error
one that survived two rounds) is caught here instead of needing a
12-minute end-to-end bench run."""

from bench import GATE_DENOM_FLOOR, SF10_SCALING_LIMIT, collect_gates


def _green_record() -> dict:
    return {
        "vs_duckdb_live_total": 1.2,
        "sf1_spot": {
            "vs_duckdb_live": {"t05": 0.4, "q01": 3.0},
            "duckdb_live": {"t05": 4.0, "q01": 0.01},  # q01 under the floor
            "errors": {},
        },
        "sf10_relational": {
            "spark_scaling_vs_sf1": {"q01": 1.4},
            "vs_duckdb_live": {"q01": 9.0},  # scaling-gated, ratio exempt
            "duckdb_live": {"q01": 0.6},
            "errors": {},
        },
        "sf10_corpus": {"spark_scaling_vs_sf1": {"t40": 4.4}, "errors": {}},
        "sf10_ann": {"spark_scaling_vs_sf1": {"build": 3.0, "serve": 1.2}, "errors": {}},
        "streaming": {"breaches": [], "errors": {}},
    }


def test_all_green_passes_and_attaches_lists():
    out = _green_record()
    gates = collect_gates(out, [], {})
    assert gates["fail"] is False
    assert gates["sf1_breaches"] == []
    assert gates["sf10_breaches"] == []
    assert gates["stream_breaches"] == []
    # the JSON record carries the (empty) verdicts per stanza
    assert out["sf1_spot"]["breaches"] == []
    assert out["sf1_spot"]["gate_denom_floor"] == GATE_DENOM_FLOOR
    assert out["sf10_relational"]["scaling_breaches"] == []
    assert out["sf10_corpus"]["scaling_breaches"] == []
    assert out["sf10_ann"]["scaling_breaches"] == []


def test_sub_floor_ratio_is_reported_not_gated():
    out = _green_record()
    # q01's 3.0x ratio sits on a 10 ms denominator — job-launch floor,
    # not plan cost; must NOT breach. t05's compute-bound 4 s denominator
    # at 2.5x MUST breach.
    out["sf1_spot"]["vs_duckdb_live"]["t05"] = 2.5
    gates = collect_gates(out, [], {})
    assert gates["sf1_breaches"] == ["t05"]
    assert gates["fail"] is True


def test_sf10_scaling_breaches_aggregate_across_stanzas():
    out = _green_record()
    out["sf10_corpus"]["spark_scaling_vs_sf1"]["t40"] = SF10_SCALING_LIMIT + 0.1
    out["sf10_ann"]["spark_scaling_vs_sf1"]["build"] = 7.0
    gates = collect_gates(out, [], {})
    assert gates["sf10_breaches"] == ["t40", "ann_build"]
    assert out["sf10_corpus"]["scaling_breaches"] == ["t40"]
    assert out["sf10_ann"]["scaling_breaches"] == ["ann_build"]
    assert gates["fail"] is True


def test_sf10_relational_ratio_gates_only_unscaled_queries():
    out = _green_record()
    # q01 has a scaling entry → its live ratio is exempt (already green);
    # q99 has only a compute-bound ratio → it gates
    out["sf10_relational"]["vs_duckdb_live"]["q99"] = 2.5
    out["sf10_relational"]["duckdb_live"]["q99"] = 0.7
    gates = collect_gates(out, [], {})
    assert gates["sf10_breaches"] == ["q99"]


def test_wholesale_stanza_error_fails_gate():
    for stanza, bucket, label in (
        ("sf1_spot", "sf1_errors", "sf1_stanza"),
        ("sf10_relational", "sf10_errors", "sf10_relational_stanza"),
        ("sf10_corpus", "sf10_errors", "sf10_corpus_stanza"),
        ("sf10_ann", "sf10_errors", "sf10_ann_stanza"),
        ("streaming", "stream_errors", "streaming_stanza"),
    ):
        out = _green_record()
        out[stanza] = {"error": "OSError: fixture build died"}
        gates = collect_gates(out, [], {})
        assert label in gates[bucket], (stanza, gates)
        assert gates["fail"] is True, stanza


def test_streaming_breaches_and_per_query_errors_fail_gate():
    out = _green_record()
    out["streaming"]["breaches"] = ["user_totals_parity"]
    gates = collect_gates(out, [], {})
    assert gates["stream_breaches"] == ["user_totals_parity"]
    assert gates["fail"] is True

    out = _green_record()
    out["sf1_spot"]["errors"] = {"t05": "AnalysisException: boom"}
    gates = collect_gates(out, [], {})
    assert gates["sf1_errors"] == ["t05"]
    assert gates["fail"] is True


def test_headline_conditions_fail_gate():
    out = _green_record()
    out["vs_duckdb_live_total"] = 2.1
    assert collect_gates(out, [], {})["fail"] is True

    assert collect_gates(_green_record(), ["q01"], {})["fail"] is True
    assert collect_gates(_green_record(), [], {"q01": "err"})["fail"] is True
    # a missing live total (all-error run) must not crash or pass silently
    out = _green_record()
    out["vs_duckdb_live_total"] = None
    out["streaming"]["breaches"] = ["x"]
    assert collect_gates(out, [], {})["fail"] is True


def test_missing_stanzas_are_tolerated():
    gates = collect_gates({"vs_duckdb_live_total": 1.0}, [], {})
    assert gates["fail"] is False
    assert gates["sf10_breaches"] == []


def test_sf100_decade_gate_and_errors():
    """The opt-in sf100 ladder gates the sf10→sf100 decade at its own
    LINEAR fence (SF100_DECADE_LIMIT), separate from the sf1→sf10
    amortization gate; per-query errors and wholesale stanza death fail
    the gate like every other stanza."""
    out = _green_record()
    out["sf100_corpus"] = {
        "decade_vs_sf10": {"t39_chunk_dedup": 10.4,
                           "t40_incremental_ingest_dedup": 12.5},
        "errors": {},
    }
    gates = collect_gates(out, [], {})
    assert gates["sf10_breaches"] == ["sf100_t40_incremental_ingest_dedup"]
    assert out["sf100_corpus"]["scaling_breaches"] == [
        "sf100_t40_incremental_ingest_dedup"
    ]
    assert gates["fail"] is True

    out = _green_record()
    out["sf100_corpus"] = {
        "decade_vs_sf10": {"t39_chunk_dedup": 10.4},
        "errors": {"t40_incremental_ingest_dedup": "boom"},
    }
    gates = collect_gates(out, [], {})
    assert "sf100_t40_incremental_ingest_dedup" in gates["sf10_errors"]
    assert gates["fail"] is True

    out = _green_record()
    out["sf100_corpus"] = {"error": "OSError: disk full"}
    gates = collect_gates(out, [], {})
    assert "sf100_corpus_stanza" in gates["sf10_errors"]
    assert gates["fail"] is True

    # in-gate decade passes; absence of the opt-in stanza is tolerated
    out = _green_record()
    out["sf100_corpus"] = {
        "decade_vs_sf10": {"t39_chunk_dedup": 10.4,
                           "t40_incremental_ingest_dedup": 9.0},
        "errors": {},
    }
    assert collect_gates(out, [], {})["fail"] is False


def test_scale_documents_maps_stay_distinct_past_affine_space(tmp_path):
    """Past k=285 the affine letter-map space is exhausted; the seeded
    permutation branch must keep every replica a DISTINCT bijection (the
    r10 sf100 one-off reused maps and minted 1.4M exact-dup groups)."""
    import duckdb

    import bench

    src = tmp_path / "src"
    src.mkdir()
    con = duckdb.connect()
    con.sql(f"""
        COPY (SELECT * FROM (VALUES
          (0, 'the quick brown fox jumps over the lazy dog', 'en', 's', 43),
          (1, 'pack my box with five dozen liquor jugs now', 'en', 's', 44)
        ) AS t(doc_id, text, lang, source, n_chars))
        TO '{src}/documents.parquet' (FORMAT PARQUET)""")
    out = tmp_path / "out"
    out.mkdir()
    bench._scale_documents(con, str(src), str(out), 300)
    dup = con.sql(f"""
        SELECT max(cnt) FROM (
          SELECT text, count(*) AS cnt
          FROM read_parquet('{out}/documents.parquet') GROUP BY text)
    """).fetchone()[0]
    n = con.sql(
        f"SELECT count(*) FROM read_parquet('{out}/documents.parquet')"
    ).fetchone()[0]
    con.close()
    assert n == 600
    assert dup == 1  # every replica text distinct — no map reuse


def test_census_families_and_outliers():
    """tools/census.py: family split by name prefix, outlier = >3x the
    family median (family-relative because baseline costs differ by
    design across families)."""
    from tools.census import census, family_of

    assert family_of("q01_pricing_summary") == "q"
    assert family_of("ml05_holdout_eval") == "ml"
    assert family_of("t39_chunk_dedup") == "t"
    assert family_of("x08_stream_stream_interval_join") == "x"
    rep = census(
        {"q01_a": 1.0, "q02_b": 2.0, "q03_c": 9.0, "ml01_fit": 5.0}
    )
    assert [o["name"] for o in rep["outliers"]] == ["q03_c"]
    assert rep["families"]["q"]["median_sec"] == 2.0
    assert rep["families"]["ml"]["n"] == 1
    # ml01's 5s is NOT an outlier: it is its own family's median
    assert rep["slowest"][0]["name"] == "q03_c"


def test_t40_indexed_gate_parity_and_scaling():
    """The persisted-index leg (r12) gates two ways: match scaling over
    SF10_SCALING_LIMIT breaches, and parity false (stored-index result
    diverging from the recompute path) breaches — a silently-wrong index
    is worse than a slow one. Wholesale stanza error fails like any
    other stanza."""
    out = _green_record()
    out["t40_indexed"] = {
        "legs": {"sf1": {"match": 2.5}, "sf10": {"match": 9.5}},
        "match_scaling_vs_sf1": 3.8,
        "parity_vs_recompute_sf1": True,
    }
    gates = collect_gates(out, [], {})
    assert gates["fail"] is False
    assert out["t40_indexed"]["scaling_breaches"] == []

    out = _green_record()
    out["t40_indexed"] = {
        "match_scaling_vs_sf1": SF10_SCALING_LIMIT + 0.1,
        "parity_vs_recompute_sf1": True,
    }
    gates = collect_gates(out, [], {})
    assert "t40_indexed_match" in gates["sf10_breaches"]
    assert gates["fail"] is True

    out = _green_record()
    out["t40_indexed"] = {
        "match_scaling_vs_sf1": 1.5,
        "parity_vs_recompute_sf1": False,
    }
    gates = collect_gates(out, [], {})
    assert "t40_indexed_parity" in gates["sf10_breaches"]
    assert gates["fail"] is True

    out = _green_record()
    out["t40_indexed"] = {"error": "Boom: dead"}
    gates = collect_gates(out, [], {})
    assert "t40_indexed_stanza" in gates["sf10_errors"]
    assert gates["fail"] is True

    # compaction (r13) is a physical-layout change: results diverging
    # across it breach like any parity failure; matching results pass
    out = _green_record()
    out["t40_indexed"] = {
        "match_scaling_vs_sf1": 1.5,
        "parity_vs_recompute_sf1": True,
        "compaction": {"match_fragmented": 3.0, "match_compacted": 2.5,
                       "parity": False},
    }
    gates = collect_gates(out, [], {})
    assert "t40_compaction_parity" in gates["sf10_breaches"]
    assert gates["fail"] is True
    out = _green_record()
    out["t40_indexed"] = {
        "match_scaling_vs_sf1": 1.5,
        "parity_vs_recompute_sf1": True,
        "compaction": {"match_fragmented": 3.0, "match_compacted": 2.5,
                       "parity": True},
    }
    gates = collect_gates(out, [], {})
    assert gates["fail"] is False


def test_sf100_ann_decade_gate():
    """The sf100 ANN leg (r12) gates build/serve decades at the same
    linear fence as the corpus ladder, labeled distinctly."""
    from bench import SF100_DECADE_LIMIT

    out = _green_record()
    out["sf100_ann"] = {"decade_vs_sf10": {"build": 9.0, "serve": 2.0}}
    gates = collect_gates(out, [], {})
    assert gates["fail"] is False
    assert out["sf100_ann"]["scaling_breaches"] == []

    out = _green_record()
    out["sf100_ann"] = {
        "decade_vs_sf10": {"build": SF100_DECADE_LIMIT + 0.5, "serve": 2.0}
    }
    gates = collect_gates(out, [], {})
    assert "sf100_ann_build" in gates["sf10_breaches"]
    assert gates["fail"] is True
