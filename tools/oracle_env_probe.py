#!/usr/bin/env python3
"""DuckDB oracle-environment fingerprint (r16, VERDICT r15 #3).

The driver's correctness gate runs the oracle SQL under ITS duckdb
build, which is not pinned to this container's (duckdb 1.0.0 here).
r15's win_moving_avg hash-failed at the driver while every local replay
was exact — a divergence that lives in the driver environment, not in
the queries. This probe emits a JSON fingerprint of every duckdb
behavior the registry's oracles depend on that is KNOWN to have varied
across duckdb releases (or between duckdb and Spark). Run it under two
builds and diff: any line that differs is a live fault line, and the
registry greps name which queries sit on it.

Usage: python3 tools/oracle_env_probe.py [> fingerprint.json]
"""
import json
import sys

import duckdb

probes = {
    # engine-native round: tie convention (half-away vs half-even) has
    # changed across releases for DOUBLE; DECIMAL is half-away. The
    # registry no longer calls round() on gate-crossing cent casts
    # (r16 floor-snap sweep) -- these rows document WHY.
    "round_double_tie_pos": "SELECT round(2.5::DOUBLE)",
    "round_double_tie_neg": "SELECT round(-2.5::DOUBLE)",
    "round_decimal_tie": "SELECT round(2.5)",
    # largest double below 0.5: a floor(x+0.5)-style round() returns 1,
    # a libm nearest-round returns 0
    "round_below_half": "SELECT round(0.49999999999999994::DOUBLE)",
    "round_scale2_2675": "SELECT round(2.675::DOUBLE, 2)",
    # portable floor-snap (the r16 convention): must be 0 and 13 in
    # EVERY build or the convention itself is broken
    "floorsnap_below_half": "SELECT floor(0.49999999999999994::DOUBLE + 0.5)",
    "floorsnap_tie": "SELECT floor(12.5::DOUBLE + 0.5)",
    # epoch(): return type and fractional handling have varied;
    # win_moving_avg's RANGE frame keys on floor(epoch(ts))
    "epoch_type": "SELECT typeof(epoch(TIMESTAMP '2024-01-02 03:04:05.678'))",
    "epoch_frac": "SELECT epoch(TIMESTAMP '2024-01-02 03:04:05.678')",
    "epoch_floor": "SELECT CAST(floor(epoch(TIMESTAMP "
                   "'2024-01-02 03:04:05.678')) AS BIGINT)",
    "epoch_us": "SELECT epoch_us(TIMESTAMP '2024-01-02 03:04:05.678')",
    # double -> integer CAST rounds in duckdb (Spark truncates; the
    # repo never casts fractional doubles to ints for that reason)
    "cast_double_int": "SELECT CAST(2.7::DOUBLE AS BIGINT)",
    "cast_double_int_tie": "SELECT CAST(2.5::DOUBLE AS BIGINT)",
    # aggregate result types the oracles cast through
    "sum_bigint_type": "SELECT typeof(sum(x)) FROM (SELECT 1::BIGINT x)",
    "sum_double_type": "SELECT typeof(sum(x)) FROM (SELECT 1.0::DOUBLE x)",
    "intdiv_type": "SELECT typeof(1::BIGINT / 100.0)",
    # null-semantics traps the contracts pin (memory: greatest skips
    # nulls in duckdb, propagates in Spark; || propagates, concat_ws
    # skips)
    "greatest_null": "SELECT greatest(1, NULL)",
    "concat_pipe_null": "SELECT 'a' || NULL",
    "concat_ws_null": "SELECT concat_ws('|', 'a', NULL, 'b')",
    # ordered-aggregate determinism the scrub/rebuild oracles rely on
    "string_agg_order": "SELECT string_agg(x, ' ' ORDER BY i) FROM "
                        "(VALUES ('b', 2), ('a', 1)) t(x, i)",
    "string_agg_filter": "SELECT string_agg(x, ' ' ORDER BY i) "
                         "FILTER (WHERE i > 1) FROM "
                         "(VALUES ('b', 2), ('a', 1)) t(x, i)",
    # window frame semantics win_moving_avg keys on
    "range_frame": "SELECT list(s) FROM (SELECT sum(v) OVER (ORDER BY t "
                   "RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS s FROM "
                   "(VALUES (1, 10), (2, 20), (4, 40)) t(t, v))",
    # md5/hash primitives the checksum oracles use
    "md5": "SELECT md5('graft')",
    "hex_cast": "SELECT ('0x' || substr(md5('graft'), 1, 15))::UBIGINT"
                "::BIGINT",
    # float formatting (the driver may hash a textual form)
    "double_repr": "SELECT CAST(0.1::DOUBLE AS VARCHAR)",
    "float32_widen": "SELECT CAST(0.1::FLOAT AS DOUBLE) = 0.1::DOUBLE",
    "neg_zero_str": "SELECT CAST(-0.0::DOUBLE AS VARCHAR)",
    "neg_zero_eq": "SELECT -0.0::DOUBLE = 0.0::DOUBLE",
}

out = {"duckdb_version": duckdb.__version__}
con = duckdb.connect()
for name, sql in sorted(probes.items()):
    try:
        v = con.execute(sql).fetchone()[0]
        out[name] = repr(v)
    except Exception as e:  # a probe that ERRORS is itself a fingerprint
        out[name] = f"ERROR: {type(e).__name__}: {e}"
print(json.dumps(out, indent=1))
if "--check" in sys.argv:
    # convention sanity: the portable floor-snap must behave identically
    # in every build; fail loudly if a build breaks it
    assert out["floorsnap_below_half"] == "1.0", out
    assert out["floorsnap_tie"] == "13.0", out
