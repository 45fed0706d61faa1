"""The gate-side oracle machinery added in round 9 (VERDICT r8 #6/#7):
the shared-fragment substituter in tools/check_correctness.py and the
deterministic verification rotation.

These tests run WITHOUT Spark: the substituter rewrites oracle SQL and
is verified by executing raw vs substituted text in DuckDB over the real
sf0.001 tables.  Two failure modes are pinned:

- **Silent disablement**: the substituter matches fragments by exact
  text/pinned regex; if an oracle's rendered text drifts, substitution
  silently stops (cold runs get slow again but stay correct).  The match
  COUNTS below fail loudly instead.
- **Wrong substitution**: a fragment swap that changed results would be
  caught by the value gate, but the equivalence test here catches it in
  seconds at sf0.001 without a Spark session.
"""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import check_correctness as CC  # noqa: E402

from data_etl_scripts_showcase__spark.queries import load_all  # noqa: E402

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def registry():
    return load_all()


class TestFragmentSubstituter:
    def test_fragment_patterns_still_match_the_registry(self, registry):
        """Drift guard: the substituter's patterns must keep matching the
        oracles they were built for.  Counts are lower bounds — adding
        consumers is fine, silently losing them all is the bug."""
        import re

        from data_etl_scripts_showcase__spark.queries.dedup import _CAND_SQL

        reach_re = re.compile(
            r"reach\(id, r\) AS \(\s*SELECT a, a FROM sym\s*UNION\s*"
            r"SELECT s\.b, reach\.r FROM reach JOIN sym s "
            r"ON s\.a = reach\.id\s*\)"
        )
        verified_re = re.compile(
            r"verified AS \(\s*SELECT c\.id_a, c\.id_b\s*FROM cand c\s*"
            r"JOIN g ga ON ga\.doc_id = c\.id_a\s*"
            r"JOIN g gb ON gb\.doc_id = c\.id_b\s*"
            r"WHERE CAST\(len\(list_intersect\(ga\.grams, gb\.grams\)\)"
            r" AS DOUBLE\)\s*"
            r"/ len\(list_distinct\(ga\.grams \|\| gb\.grams\)\)"
            r" >= 0\.5\s*\)"
        )
        cand_text = f"cand AS ({_CAND_SQL})"
        oracles = [q.oracle for q in registry.values() if q.oracle]
        n_reach = sum(1 for o in oracles if reach_re.search(o))
        n_verified = sum(1 for o in oracles if verified_re.search(o))
        n_cand = sum(1 for o in oracles if cand_text in o)
        assert n_reach >= 6, f"reach consumers dropped to {n_reach}"
        assert n_verified >= 8, f"verified consumers dropped to {n_verified}"
        assert n_cand >= 15, f"cand consumers dropped to {n_cand}"

    def test_reach_consumers_only_min_group_by(self, registry):
        """The reach→(id, component) swap is exact ONLY because every
        consumer reads reach as ``min(r) .. GROUP BY id``.  Any new kind
        of consumer must either follow that shape or opt out of the
        fragment (change the CTE text)."""
        import re

        uses = re.compile(r"FROM reach(?!\s+JOIN sym)")
        ok = re.compile(r"min\(r\)[^)]*\)?[^F]*FROM reach GROUP BY id")
        for name, q in registry.items():
            if not q.oracle or "reach(id, r) AS" not in q.oracle:
                continue
            for m in uses.finditer(q.oracle):
                tail = q.oracle[max(0, m.start() - 80) : m.end() + 30]
                assert (
                    "min(r)" in tail and "GROUP BY id" in tail
                ), f"{name} consumes reach outside min(r)..GROUP BY id: {tail!r}"

    def test_substituted_oracles_equal_raw(self, registry, tmp_path):
        """End-to-end equivalence on the real sf0.001 tables: for one
        consumer of each fragment kind, raw and substituted SQL return
        identical sorted rows."""
        con = CC.duck_connection(SF)
        sub = CC.fragment_substituter(con, str(tmp_path))
        for name in (
            "d9_neardup_components",  # reach + verified + cand
            "pr3_label_propagation",  # cand only
            "d8_dedup_survivors",  # verified + cand
        ):
            raw_sql = registry[name].oracle
            new_sql = sub(raw_sql)
            assert new_sql != raw_sql, f"{name}: nothing substituted"
            raw = con.execute(
                f"SELECT * FROM ({raw_sql}) ORDER BY ALL"
            ).fetchall()
            got = con.execute(
                f"SELECT * FROM ({new_sql}) ORDER BY ALL"
            ).fetchall()
            assert got == raw, f"{name}: substituted oracle diverged"

    def test_capped_cand_variants_untouched(self, registry, tmp_path):
        """d13/d14/d16-style non-standard candidate stages must never be
        rewritten — their cand/verified bodies differ from the fragment."""
        con = CC.duck_connection(SF)
        sub = CC.fragment_substituter(con, str(tmp_path))
        for name in ("d14_lsh_capped_pairs", "d13_cross_snapshot_dedup"):
            if name in registry and registry[name].oracle:
                sql = registry[name].oracle
                # cand text may still match if d14 uses the standard
                # uncapped cand upstream — what must NOT match is the
                # capped candidate body itself; substitution must keep
                # the query executable and equivalent either way.
                raw = con.execute(
                    f"SELECT * FROM ({sql}) ORDER BY ALL"
                ).fetchall()
                got = con.execute(
                    f"SELECT * FROM ({sub(sql)}) ORDER BY ALL"
                ).fetchall()
                assert got == raw, f"{name}: substitution changed values"

    def test_cache_off_is_identity(self, registry):
        con = CC.duck_connection(SF)
        sub = CC.fragment_substituter(con, None)
        sql = registry["d9_neardup_components"].oracle
        assert sub(sql) == sql

    def test_substitution_tied_to_inputs(self, registry, tmp_path):
        """ADVICE r9: the reach/comp and verified swaps are only exact
        over the STANDARD upstream fragments.  An oracle carrying the
        same verified/reach TEXT over a VARIANT cand body (different
        threshold, capped pairs) must run verbatim — substituting the
        standard components under it would produce a confusing downstream
        value mismatch instead of a skip here."""
        con = CC.duck_connection(SF)
        sub = CC.fragment_substituter(con, str(tmp_path))
        std = registry["d9_neardup_components"].oracle
        # Variant cand: same verified/reach text, different cand body.
        from data_etl_scripts_showcase__spark.queries.dedup import _CAND_SQL

        variant = std.replace(
            f"cand AS ({_CAND_SQL})",
            f"cand AS ({_CAND_SQL} LIMIT 99999)",
        )
        assert variant != std, "test setup: cand text not found"
        assert sub(variant) == variant, (
            "variant-cand oracle was rewritten — closure swap not tied "
            "to its inputs"
        )


class TestRotation:
    def test_slice_deterministic_and_sized(self, registry):
        a = CC.rotation_ids(registry, 9)
        b = CC.rotation_ids(registry, 9)
        assert a == b and len(a) == CC.ROTATION_SLICE
        assert all(n in registry for n in a)

    def test_rotation_covers_every_id(self, registry):
        """ceil(|registry| / 25) consecutive rounds touch every id."""
        import math

        rounds = math.ceil(len(registry) / CC.ROTATION_SLICE)
        seen = set()
        for r in range(1, rounds + 1):
            seen.update(CC.rotation_ids(registry, r))
        assert seen == set(registry)
