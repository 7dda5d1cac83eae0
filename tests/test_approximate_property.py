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
