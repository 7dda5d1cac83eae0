"""Hoeffding-style statistical acceptance — the port of the reference's
``ApproximateProperty`` harness (algebird-test
.../ApproximateProperty.scala:6-109): run many independent trials of
(exact object -> sketch -> does the claimed interval contain the exact
answer), and accept iff

    successes >= sum(claimed probabilities) - sqrt(-n * ln(fp_rate) / 2)

so a correct sketch fails the suite with probability <= fp_rate rather
than flaking on any single unlucky trial.
"""

import math

import numpy as np

from algebird_spark.sketches import CMS, HLL, BloomFilter

FP_RATE = 1e-3


def hoeffding_accept(successes: int, claimed_prob_sum: float, n: int) -> bool:
    slack = math.sqrt(-n * math.log(FP_RATE) / 2.0)
    return successes >= claimed_prob_sum - slack


def test_hll_interval_probability():
    n_trials = 60
    p = 10
    successes = 0
    claimed = 0.0
    rng = np.random.default_rng(99)
    for t in range(n_trials):
        true_n = int(rng.integers(500, 50_000))
        vals = rng.integers(0, 2**40, size=true_n, dtype=np.int64)
        exact = len(np.unique(vals))
        h = HLL(p=p)
        h.update_batch(vals)
        ap = h.approximate_size()
        claimed += ap.prob
        if ap.contains(exact):
            successes += 1
    assert hoeffding_accept(successes, claimed, n_trials), \
        f"{successes}/{n_trials} vs claimed {claimed:.1f}"


def test_cms_eps_delta_probability():
    n_trials = 40
    eps, delta = 0.005, 1e-3
    successes = 0
    claimed = 0.0
    rng = np.random.default_rng(7)
    for t in range(n_trials):
        vals = rng.zipf(1.3, size=20_000)
        vals = vals[vals < 100_000].astype(np.int64)
        c = CMS(eps=eps, delta=delta)
        c.update_batch(vals)
        keys, counts = np.unique(vals, return_counts=True)
        probe = rng.choice(len(keys), size=min(50, len(keys)), replace=False)
        ap_ok = True
        for i in probe:
            ap = c.frequency(int(keys[i]))
            if not (ap.low <= counts[i] <= ap.high):
                ap_ok = False
        claimed += 1 - delta * len(probe)  # union bound over probes
        if ap_ok:
            successes += 1
    assert hoeffding_accept(successes, claimed, n_trials)


def test_bloom_fpp_probability():
    n_trials = 30
    fpp = 0.02
    successes = 0
    rng = np.random.default_rng(11)
    for t in range(n_trials):
        n = int(rng.integers(1_000, 20_000))
        present = rng.choice(np.arange(10**7), size=n, replace=False).astype(np.int64)
        bf = BloomFilter(num_entries=n, fp_prob=fpp)
        bf.update_batch(present)
        absent = np.arange(10**9, 10**9 + 5_000, dtype=np.int64)
        measured = float(bf.contains_batch(absent).mean())
        no_fn = bool(bf.contains_batch(present[:500]).all())
        if no_fn and measured <= 2.0 * fpp:
            successes += 1
    # false negatives are impossible; measured fpp ~ Binomial(5000, <=fpp),
    # P(measured > 2*fpp) is astronomically small per trial
    assert hoeffding_accept(successes, 0.999 * n_trials, n_trials)


# ---------------------------------------------------------------------------
# Approximate algebra (Approximate.scala:25-174 semantics)
# ---------------------------------------------------------------------------

def test_approximate_add_sub_mul_interval_containment():
    """If a contains x and b contains y, then a+b contains x+y, a-b
    contains x-y, a*b contains x*y — for all sign combinations."""
    from algebird_spark.sketches import Approximate
    import itertools
    rng = np.random.default_rng(23)
    for _ in range(300):
        x, y = rng.uniform(-50, 50, size=2)
        a = Approximate(x - rng.uniform(0, 5), x, x + rng.uniform(0, 5), 0.9)
        b = Approximate(y - rng.uniform(0, 5), y, y + rng.uniform(0, 5), 0.8)
        assert (a + b).contains(x + y)
        assert (a - b).contains(x - y)
        assert (a * b).contains(x * y)
        for op in (a + b, a - b, a * b):
            assert op.low <= op.estimate <= op.high
            assert abs(op.prob - 0.72) < 1e-12  # probs multiply


def test_approximate_identities_and_exactness():
    from algebird_spark.sketches import Approximate
    a = Approximate(3.0, 4.0, 6.0, 0.95)
    zero, one = Approximate.zero(), Approximate.one()
    assert (a + zero) == a                       # monoid identity
    assert (a * one) == a and (one * a) == a     # one preserves prob
    assert (a * zero).is_zero                    # annihilation, prob 1
    assert Approximate.exact(7).is_exact
    assert (a + 2.0).contains(6.0)               # scalar coercion
    assert a.with_min(3.5).low == 3.5
    assert a.with_max(5.0).high == 5.0
    neg = a.negate()
    assert (neg.low, neg.high) == (-6.0, -3.0)


def test_approximate_boolean_algebra():
    from algebird_spark.sketches import ApproximateBoolean as AB
    t9, t8 = AB(True, 0.9), AB(True, 0.8)
    f9, f8 = AB(False, 0.9), AB(False, 0.8)
    both = t9 & t8
    assert both.is_true and abs(both.prob - 0.72) < 1e-12
    # false wins with the max-confidence false case
    m = t9 & f8
    assert not m.is_true and m.prob == 0.8
    o = f9 | t8
    assert o.is_true and o.prob == 0.8
    nf = f9 | f8
    assert not nf.is_true and abs(nf.prob - 0.72) < 1e-12
    x = t9 ^ t8
    assert not x.is_true and abs(x.prob - 0.72) < 1e-12
    assert (~t9).is_true is False and (~t9).prob == 0.9
    assert AB.exact(True).prob == 1.0


def test_approximate_prob_is_lower_bound_empirically():
    """Monte-carlo mirror of ApproximateTest.scala: compose independent
    intervals whose individual containment rates match their stated
    prob; the composed containment rate must be >= the composed prob."""
    from algebird_spark.sketches import Approximate
    rng = np.random.default_rng(31)
    n, p1, p2 = 20000, 0.9, 0.8
    hits = 0
    for _ in range(n):
        x, y = rng.uniform(1, 10, size=2)
        # interval contains truth iff an independent coin lands < p
        a_ok, b_ok = rng.random() < p1, rng.random() < p2
        a = (Approximate(x - 1, x, x + 1, p1) if a_ok
             else Approximate(x + 2, x + 3, x + 4, p1))
        b = (Approximate(y - 1, y, y + 1, p2) if b_ok
             else Approximate(y + 2, y + 3, y + 4, p2))
        s = a + b
        hits += s.contains(x + y)
        assert abs(s.prob - p1 * p2) < 1e-12
    assert hits / n >= p1 * p2 - 0.01


def test_hll_intersection_uses_algebra_and_clamps():
    from algebird_spark.sketches import HLL
    a, b = HLL(p=12), HLL(p=12)
    a.update_batch(np.arange(0, 6000, dtype=np.int64))
    b.update_batch(np.arange(12000, 18000, dtype=np.int64))  # disjoint
    ap = HLL.intersection_size([a, b])
    assert ap.low >= 0.0 and ap.estimate >= 0.0
    assert ap.contains(0) or ap.estimate < 600  # near-zero intersection


def test_qtree_byte_equality_across_build_orders():
    from algebird_spark.sketches import QTree, from_bytes
    rng = np.random.default_rng(7)
    vals = rng.uniform(0, 100, size=3000)
    a, b = QTree(k=10, base_level=-2), QTree(k=10, base_level=-2)
    a.update_batch(vals)
    perm = rng.permutation(len(vals))
    chunks = np.array_split(vals[perm], 5)
    parts = []
    for ch in chunks:
        q = QTree(k=10, base_level=-2)
        q.update_batch(ch)
        parts.append(q)
    # QTree compression is order-dependent in general; byte-equality is
    # asserted for the SAME state serialized from different dict orders
    rt = from_bytes(a.to_bytes())
    assert rt.to_bytes() == a.to_bytes()
    merged = parts[0]
    for p_ in parts[1:]:
        merged.merge_in_place(p_)
    rt2 = from_bytes(merged.to_bytes())
    assert rt2.to_bytes() == merged.to_bytes()
