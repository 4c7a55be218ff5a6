"""Portable HLL: registers vs a pure-Python replay, merge algebra,
estimate accuracy and exact harmonic numerator."""

from sensordatapipelines_spark.operators.sketches import (
    CMS_A,
    CMS_B,
    hll_alpha,
    hll_estimate,
    hll_merge,
    hll_sketch,
)

POLY_MOD = 2147483647


def _h(key: str) -> int:
    h = 0
    for c in key:
        h = (h * 31 + ord(c)) % POLY_MOD
    return (CMS_A[0] * h + CMS_B[0]) % POLY_MOD


def _py_registers(keys, p):
    regs = {}
    for k in keys:
        h = _h(str(k))
        reg = h & ((1 << p) - 1)
        rest = h >> p
        rho = 1
        for t in range(1, 31 - p + 1):
            if rest % (1 << t) == 0:
                rho += 1
        regs[reg] = max(regs.get(reg, 0), rho)
    return regs


def test_registers_match_python_replay(spark):
    keys = [f"user_{i}" for i in range(500)]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {
        r.register: r.rho for r in hll_sketch(df, "k", p=6).collect()
    }
    assert got == _py_registers(keys, 6)


def test_merge_equals_sketch_of_union(spark):
    a = spark.createDataFrame([(f"u{i}",) for i in range(300)], "k string")
    b = spark.createDataFrame([(f"u{i}",) for i in range(150, 450)], "k string")
    merged = {
        (r.grp, r.register): r.rho
        for r in hll_merge(hll_sketch(a, "k", p=7), hll_sketch(b, "k", p=7)).collect()
    }
    whole = {
        (r.grp, r.register): r.rho
        for r in hll_sketch(a.unionByName(b), "k", p=7).collect()
    }
    assert merged == whole


def test_estimate_accuracy_and_exact_numerator(spark):
    n, p = 5000, 8
    m, rmax = 1 << p, 31 - p + 1
    df = spark.createDataFrame([(f"id_{i}",) for i in range(n)], "k string")
    sk = hll_sketch(df, "k", p=p)
    est = hll_estimate(sk, p=p).collect()[0]
    # z_num must equal the exact integer recomputed from the registers.
    regs = {r.register: r.rho for r in sk.collect()}
    z_num = sum(1 << (rmax - rho) for rho in regs.values()) + (m - len(regs)) * (
        1 << rmax
    )
    assert est.z_num == z_num
    assert est.n_registers == len(regs)
    expect = hll_alpha(m) * m * m * float(1 << rmax) / z_num
    assert est.est_raw == expect
    # Standard error for p=8 is ~1.04/sqrt(256) = 6.5%; allow 3 sigma.
    assert abs(est.est_raw - n) / n < 0.20


def test_grouped_sketch(spark):
    rows = [(f"u{i % 40}", "a") for i in range(200)] + [
        (f"v{i}", "b") for i in range(10)
    ]
    df = spark.createDataFrame(rows, "k string, src string")
    sk = hll_sketch(df, "k", p=5, group_by="src")
    grps = {r.grp for r in sk.collect()}
    assert grps == {"a", "b"}
    regs_a = _py_registers([f"u{i}" for i in range(40)], 5)
    got_a = {r.register: r.rho for r in sk.filter("grp = 'a'").collect()}
    assert got_a == regs_a
