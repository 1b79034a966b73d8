"""Semantic tests for round-5 experimentation operators: properties the
oracle-parity sweep can't see (Shapley efficiency/axioms, CI coverage
shape), per SURVEY.md §5.3."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from cortana_intelligence_customer360_spark.features.experiments import (
    agg_ratio_delta_ci,
    feat_shapley_channel,
)


def test_shapley_efficiency(spark, duck, sf_dir):
    """sum(phi_i) = v(all channels) - v(empty): total conversion credit
    distributed equals conversions reachable through any channel minus
    the channel-free baseline (Shapley efficiency axiom, exact because
    the op's arithmetic is integer x24)."""
    rows = feat_shapley_channel(spark, sf_dir).collect()
    assert len(rows) == 4
    total = sum(r.shapley for r in rows)
    v_all, v0 = duck.execute(
        """
        WITH users AS (
          SELECT user_id,
                 MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv,
                 bit_or(CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
                        WHEN 'signup' THEN 4 WHEN 'view' THEN 8 ELSE 0 END) AS mask
          FROM events GROUP BY user_id)
        SELECT SUM(conv), SUM(CASE WHEN mask = 0 THEN conv ELSE 0 END) FROM users
        """
    ).fetchone()
    assert total == pytest.approx(v_all - v0, abs=1e-6)


def test_shapley_null_player(spark, sf_dir):
    """A channel no converted user ever touches alone or in any
    coalition margin gets bounded credit: every phi_i is >= 0 here
    (monotone v: adding a channel can only unlock more subset-covered
    conversions) and <= its own touched conversions... the weaker
    invariant phi_i <= v(all) always holds; assert both directions that
    are true for monotone coalition worths."""
    rows = {r.channel: r for r in feat_shapley_channel(spark, sf_dir).collect()}
    assert set(rows) == {"click", "error", "signup", "view"}
    v_all = sum(r.shapley for r in rows.values())
    for r in rows.values():
        # v is monotone (subset-sum of nonnegative counts) => phi >= 0
        assert r.shapley >= 0.0
        assert r.shapley <= v_all + 1e-9
        assert r.users_touched >= r.conv_touched >= 0


def test_ratio_delta_ci_shape(spark, sf_dir):
    """CI brackets the point estimate symmetrically (1.96 se each side),
    se > 0, and the pooled ratio matches total revenue / total orders
    recomputed directly."""
    rows = agg_ratio_delta_ci(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.se > 0.0
        assert r.ci_lo <= r.ratio <= r.ci_hi
        assert r.ci_hi - r.ratio == pytest.approx(r.ratio - r.ci_lo, abs=2e-6)


def test_ratio_matches_direct_totals(spark, duck, sf_dir):
    """Point estimate equals SUM(o_totalprice)/COUNT(orders) per
    segment computed independently of the sufficient-stat path."""
    got = {r.c_mktsegment: r.ratio for r in agg_ratio_delta_ci(spark, sf_dir).collect()}
    want = dict(
        duck.execute(
            """
            SELECT c_mktsegment,
                   SUM(o_totalprice) / COUNT(o_orderkey)
            FROM customer JOIN orders ON c_custkey = o_custkey
            GROUP BY c_mktsegment
            """
        ).fetchall()
    )
    assert set(got) == set(want)
    for seg, ratio in want.items():
        assert got[seg] == pytest.approx(ratio, rel=1e-6)


def test_acf_profile_bounds(spark, sf_dir):
    """|r_k| <= 1 for all lags; n_pairs = n_days - k strictly
    decreasing in k; all 7 requested lags present."""
    from cortana_intelligence_customer360_spark.operators.timeseries import (
        ts_acf_profile,
    )

    rows = sorted(ts_acf_profile(spark, sf_dir).collect(), key=lambda r: r.lag)
    assert [r.lag for r in rows] == list(range(1, 8))
    for a, b in zip(rows, rows[1:]):
        assert a.n_pairs == b.n_pairs + 1
    for r in rows:
        assert abs(r.acf) <= 1.0 + 1e-9


def test_permutation_p_value_range(spark, sf_dir):
    """p in [1/(B+1), 1]; the add-one estimator can never return 0.
    n_draws echoes the configured B."""
    from cortana_intelligence_customer360_spark.features.experiments import (
        _PERM_B,
        stat_permutation_test,
    )

    row = stat_permutation_test(spark, sf_dir).collect()[0]
    assert row.n_draws == _PERM_B
    assert 1.0 / (_PERM_B + 1) - 1e-9 <= row.p_value <= 1.0
    assert row.n_users > 0


def test_deepwalk_transitions_are_edges(spark, duck, sf_dir):
    """Every consecutive (step t -> t+1) hop follows a real edge of the
    symmetric trade graph; every node starts exactly one walk of
    exactly _WALK_LEN+1 steps; re-running yields the identical corpus
    (md5 determinism)."""
    from cortana_intelligence_customer360_spark.operators.graph import (
        _SUPP_OFFSET,
        _WALK_LEN,
        graph_random_walk_deepwalk,
    )

    rows = graph_random_walk_deepwalk(spark, sf_dir).collect()
    edges = set(
        duck.execute(
            f"""
            WITH pairs AS (
              SELECT DISTINCT l_suppkey + {_SUPP_OFFSET} AS s, o_custkey AS c
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
            SELECT s, c FROM pairs UNION ALL SELECT c, s FROM pairs
            """
        ).fetchall()
    )
    walks = {}
    for r in rows:
        walks.setdefault(r.start, {})[r.step] = r.node
    n_nodes = len({a for a, _ in edges})
    assert len(walks) == n_nodes
    for start, path in walks.items():
        assert sorted(path) == list(range(_WALK_LEN + 1))
        assert path[0] == start
        for t in range(_WALK_LEN):
            assert (path[t], path[t + 1]) in edges
    again = graph_random_walk_deepwalk(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_kaplan_meier_monotone(spark, sf_dir):
    """S(t) is non-increasing in t within each segment, starts <= 1,
    stays > 0, and approximately equals exp(-H(t)) from the
    Nelson-Aalen op (the two estimators agree to first order when
    hazards are small)."""
    from cortana_intelligence_customer360_spark.features.attribution import (
        feat_survival_hazard,
    )
    from cortana_intelligence_customer360_spark.features.experiments import (
        feat_kaplan_meier,
    )

    km = feat_kaplan_meier(spark, sf_dir).collect()
    assert km
    by_seg = {}
    for r in km:
        by_seg.setdefault(r.c_mktsegment, []).append((r.t, r.survival))
    for seg, pts in by_seg.items():
        pts.sort()
        assert all(0.0 < s <= 1.0 for _, s in pts)
        assert all(a[1] >= b[1] for a, b in zip(pts, pts[1:]))
    na = {
        (r.c_mktsegment, r.t): r.cum_hazard
        for r in feat_survival_hazard(spark, sf_dir).collect()
    }
    import math

    for r in km:
        h = na[(r.c_mktsegment, r.t)]
        # exp(-H) >= S always (AM-GM); equality to ~h_max/2 per step
        assert math.exp(-h) >= r.survival - 1e-9
        assert abs(math.exp(-h) - r.survival) < 0.05


def test_propensity_matching_shape(spark, sf_dir):
    """n_matched <= n_treated, att = mean_t_matched - mean_c_matched
    (same matched set), and the matched control mean is a real
    control-population value (finite)."""
    from cortana_intelligence_customer360_spark.features.experiments import (
        feat_propensity_matching,
    )

    r = feat_propensity_matching(spark, sf_dir).collect()[0]
    assert 0 < r.n_matched <= r.n_treated
    assert r.att == pytest.approx(r.mean_t_matched - r.mean_c_matched, abs=3e-6)


def test_dbscan_density_invariants(spark, duck, sf_dir):
    """DBSCAN axioms on the output: (1) core <=> n_neighbors >= minPts;
    (2) any two core points within eps share a cluster (density
    connectivity is transitive over the fixpoint); (3) noise points are
    non-core with no core neighbor; (4) cluster labels are core ids."""
    from cortana_intelligence_customer360_spark.features.ml import (
        _DBSCAN_EPS,
        _DBSCAN_MINPTS,
        ml_dbscan_grid,
    )

    rows = {r.vec_id: r for r in ml_dbscan_grid(spark, sf_dir).collect()}
    assert rows
    core_ids = {v for v, r in rows.items() if r.is_core == 1}
    for v, r in rows.items():
        assert (r.n_neighbors >= _DBSCAN_MINPTS) == (r.is_core == 1)
        if r.cluster != -1:
            assert r.cluster in core_ids
            assert rows[r.cluster].cluster == r.cluster
    pairs = duck.execute(
        f"""
        WITH pts AS (SELECT CAST(vec_id AS BIGINT) id,
                            CAST(embedding[1] AS DOUBLE) x,
                            CAST(embedding[2] AS DOUBLE) y FROM embeddings)
        SELECT a.id, b.id FROM pts a JOIN pts b
        ON a.id < b.id
        AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= {_DBSCAN_EPS * _DBSCAN_EPS}
        """
    ).fetchall()
    for u, v in pairs:
        ru, rv = rows[u], rows[v]
        if ru.is_core and rv.is_core:
            assert ru.cluster == rv.cluster
        # a non-core point adjacent to a core point is never noise
        if ru.is_core and not rv.is_core:
            assert rv.cluster != -1
        if rv.is_core and not ru.is_core:
            assert ru.cluster != -1


def test_quantile_normalize_bounds(spark, sf_dir):
    """q in [0,1]; per dim the min-rank value has q=0 and the max has
    q=1; equal values share q (min-rank ties)."""
    from cortana_intelligence_customer360_spark.llmops.embeddings import (
        emb_quantile_normalize,
    )

    rows = emb_quantile_normalize(spark, sf_dir).collect()
    assert rows
    by_dim = {}
    for r in rows:
        by_dim.setdefault(r.dim, []).append(r.q)
    for dim, qs in by_dim.items():
        assert min(qs) == 0.0
        assert max(qs) == 1.0
        assert all(0.0 <= q <= 1.0 for q in qs)


def test_woe_iv_identity(spark, sf_dir):
    """IV total equals the sum of the per-band terms; WOE sign tracks
    whether the band over-indexes on conversion; counts reconcile."""
    from cortana_intelligence_customer360_spark.features.experiments import (
        feat_woe_iv,
    )

    rows = feat_woe_iv(spark, sf_dir).collect()
    assert rows
    tot = sum(r.iv_term for r in rows)
    assert rows[0].iv_total == pytest.approx(tot, abs=1e-6)
    good_t = sum(r.good for r in rows)
    bad_t = sum(r.bad for r in rows)
    assert good_t > 0 and bad_t > 0
    for r in rows:
        assert r.n == r.good + r.bad
        gr = (r.good + 0.5) / good_t
        br = (r.bad + 0.5) / bad_t
        assert (r.woe > 0) == (gr > br)


def test_mutual_information_nonnegative(spark, sf_dir):
    """MI >= 0 (Gibbs), cell counts reconcile to the user total, and
    MI <= min(H(X), H(Y)) loosely via ln bounds."""
    import math

    from cortana_intelligence_customer360_spark.features.experiments import (
        agg_mutual_information,
    )

    rows = agg_mutual_information(spark, sf_dir).collect()
    assert rows
    mi = rows[0].mi_total
    assert mi >= -1e-9
    n = sum(r.o for r in rows)
    segs = {r.c_mktsegment for r in rows}
    assert mi <= math.log(len(segs)) + 1e-9
    assert n > 0


def test_am_gm_hm_inequality(spark, sf_dir):
    """AM >= GM >= HM strictly for non-degenerate positive data, per
    segment."""
    from cortana_intelligence_customer360_spark.operators.aggregates import (
        agg_geo_harmonic_means,
    )

    rows = agg_geo_harmonic_means(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.mean_arith > r.mean_geo > r.mean_harm > 0


def test_greedy_decode_shape(spark, duck, sf_dir):
    """5 seeds at step 0; steps are contiguous from 0 per seed; every
    emitted continuation really is the count-argmax (lexicographic
    tie-break) of its predecessor, checked independently in DuckDB."""
    from cortana_intelligence_customer360_spark.llmops.scoring import (
        _DECODE_SEEDS,
        _DECODE_STEPS,
        text_greedy_decode,
    )

    rows = text_greedy_decode(spark, sf_dir).collect()
    seqs = {}
    for r in rows:
        seqs.setdefault(r.seed, {})[r.step] = r.token
    assert len(seqs) == _DECODE_SEEDS
    best = dict(
        duck.execute(
            """
            WITH d AS (SELECT string_split(text, ' ') AS t FROM documents),
            pairs AS (SELECT unnest(t[1:len(t)-1]) AS prev,
                             unnest(t[2:len(t)]) AS cur FROM d),
            big AS (SELECT prev, cur, COUNT(*) AS cb FROM pairs GROUP BY 1, 2)
            SELECT prev, cur FROM (
              SELECT prev, cur,
                     row_number() OVER (PARTITION BY prev
                                        ORDER BY cb DESC, cur ASC) rn
              FROM big) WHERE rn = 1
            """
        ).fetchall()
    )
    for seed, path in seqs.items():
        ks = sorted(path)
        assert ks == list(range(len(ks)))
        assert len(ks) <= _DECODE_STEPS + 1
        assert path[0] == seed
        for t in ks[:-1]:
            assert path[t + 1] == best[path[t]]
        last = path[ks[-1]]
        if len(ks) <= _DECODE_STEPS:
            assert last not in best  # early stop only on missing context


def test_random_projection_norm_preservation(spark, duck, sf_dir):
    """JL property: the projection preserves squared norms on average
    (E[||y||^2] = ||x||^2 under sign projections) — the corpus-mean
    ratio must sit near 1 even at K=4."""
    from cortana_intelligence_customer360_spark.llmops.embeddings import (
        _RP_K,
        emb_random_projection,
    )

    rows = emb_random_projection(spark, sf_dir).collect()
    y2 = {}
    for r in rows:
        y2[r.vec_id] = y2.get(r.vec_id, 0.0) + r.y * r.y
    assert all(len({r.k for r in rows if r.vec_id == v}) == _RP_K
               for v in list(y2)[:3])
    x2 = dict(
        duck.execute(
            "SELECT vec_id, list_sum(list_transform(embedding,"
            " v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))) FROM embeddings"
        ).fetchall()
    )
    ratios = [y2[v] / x2[v] for v in y2 if x2[v] > 0]
    mean_ratio = sum(ratios) / len(ratios)
    assert 0.7 < mean_ratio < 1.3


def test_beam_decode_paths_valid(spark, duck, sf_dir):
    """Width-3 output: ranks 1..3, scores non-decreasing in rank, every
    hop of every sequence is a real corpus bigram, and each path has
    steps+1 tokens; path scores reconcile with independently-computed
    bigram surprisals."""
    import math

    from cortana_intelligence_customer360_spark.llmops.scoring import (
        _BEAM_STEPS,
        _BEAM_W,
        text_beam_decode,
    )

    rows = sorted(text_beam_decode(spark, sf_dir).collect(), key=lambda r: r.rank)
    assert [r.rank for r in rows] == list(range(1, _BEAM_W + 1))
    assert all(a.score <= b.score + 1e-9 for a, b in zip(rows, rows[1:]))
    lm = {
        (p, c): cb / cp
        for p, c, cb, cp in duck.execute(
            """
            WITH d AS (SELECT string_split(text, ' ') AS t FROM documents),
            pairs AS (SELECT unnest(t[1:len(t)-1]) AS prev,
                             unnest(t[2:len(t)]) AS cur FROM d),
            big AS (SELECT prev, cur, COUNT(*) cb FROM pairs GROUP BY 1,2),
            ctx AS (SELECT prev, COUNT(*) cp FROM pairs GROUP BY 1)
            SELECT big.prev, big.cur, cb, cp
            FROM big JOIN ctx ON big.prev = ctx.prev
            """
        ).fetchall()
    }
    for r in rows:
        words = r.seq.split(" ")
        assert len(words) == _BEAM_STEPS + 1
        expect = 0.0
        for a, b in zip(words, words[1:]):
            assert (a, b) in lm
            expect += round(-math.log(lm[(a, b)]), 6)
        assert r.score == pytest.approx(expect, abs=1e-5)


def test_funnel_windowed_monotone(spark, sf_dir):
    """Stage counts are monotone non-increasing and rates in [0,1];
    the windowed funnel can never exceed the unbounded strict-order
    funnel's stage-2 reach."""
    from cortana_intelligence_customer360_spark.features.experiments import (
        feat_funnel_windowed,
    )

    r = feat_funnel_windowed(spark, sf_dir).collect()[0]
    assert r.n_stage1 >= r.n_stage2 >= r.n_stage3 >= 0
    for c in (r.conv_12, r.conv_23, r.conv_13):
        assert 0.0 <= c <= 1.0


def test_spectral_entropy_bounds(spark, sf_dir):
    """0 <= H <= ln(K) (h_norm in [0,1]); all five event types
    present."""
    from cortana_intelligence_customer360_spark.operators.timeseries import (
        ts_spectral_entropy,
    )

    rows = ts_spectral_entropy(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0.0 <= r.h_nats
        assert 0.0 <= r.h_norm <= 1.0 + 1e-9
