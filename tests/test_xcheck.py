"""Contract tests for the sf-tagged xcheck channel paths (VERDICT r8 #4).

Before r9 every channel but k01 shared one un-tagged path across sf0.01
correctness runs and sf0.1 bench runs in the same tree — a bench run could
leave a stale intermediate for a later sf0.01 oracle. These pin the tagging
contract: distinct SFs never share a path, the tag is basename-keyed (the
driver and tests may mount the same sf dir at different roots), and the
oracle-side default resolves the env override at CALL time.
"""

from __future__ import annotations

from score_spark.xcheck import sf_tag, xcheck_path


def test_distinct_sfs_get_distinct_paths():
    assert (xcheck_path("h01_rollup", "/root/testdata/sf0.1")
            != xcheck_path("h01_rollup", "/root/testdata/sf0.01"))


def test_tag_is_basename_keyed_and_slash_insensitive():
    assert sf_tag("/a/b/sf0.01") == sf_tag("/other/root/sf0.01/") == "sf0_01"
    assert (xcheck_path("c", "/a/b/sf0.01")
            == xcheck_path("c", "/other/root/sf0.01/"))


def test_oracle_default_resolves_env_at_call_time(monkeypatch):
    monkeypatch.setenv("SCORE_SPARK_ORACLE_SF_DIR", "/root/testdata/sf0.1")
    assert xcheck_path("d03_candidates").endswith("d03_candidates_sf0_1")
    monkeypatch.setenv("SCORE_SPARK_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    assert xcheck_path("d03_candidates").endswith("d03_candidates_sf0_01")


def test_every_channel_name_stays_separable():
    # names must not collide after tagging (e.g. "x_sf0" + "1" vs "x" + "sf0_1")
    names = ["h01_rollup", "d03_candidates", "d04_simhash",
             "s03_candidates", "s04_candidates", "s05_candidates",
             "p01_nested_pq", "p01_nested_js", "k01_zorder"]
    paths = {xcheck_path(n, sf) for n in names
             for sf in ("/t/sf0.001", "/t/sf0.01", "/t/sf0.1")}
    assert len(paths) == len(names) * 3
