"""Adversarial local testdata twin (VERDICT r7 "Next round" #1).

Generates a parallel sf0.01-scale dataset at ``advdata/sf_adv`` carrying
every hostile trait the round-7 driver probe bits imply the driver's own
generation has, so the full oracle ledger can be made to pass on data the
local clean tables never exercise:

- events.ts written as parquet INT64 TIMESTAMP(NANOS) with real sub-µs
  residue (proven by events_ns_residue_probe red + semantics_ns_canary
  green: the driver's DuckDB truncates ns→µs like local v1.0, so the red
  bit had to come from Spark's exact nanosAsLong read), including values
  within 1 µs below second boundaries and a pre-1970 cluster where
  floor(sec) != trunc(sec).
- NULLs in every non-shape-defining column (ts, value, user_id, event_id,
  props, o_orderkey, o_custkey, o_orderdate, o_totalprice, quantities,
  doc text, doc ids, acctbal ...). Columns that define driver row shape
  (event_type, o_orderpriority, l_returnflag, lang) stay NULL-free: the
  driver's red gates all ROW-MATCHED at 5/5/3/5 groups, so its data has
  clean group keys.
- Hostile-but-tame doubles: -0.0, denormals, e6-half/shortest-repr
  boundary values. Magnitudes stay <= ~9e5 — every driver double-sum
  gate is green, so its data cannot make double summation order-visible
  (and that class is unfixable for plain SUM(double) anyway); overflow
  robustness is enforced in the OPERATORS (clamped quantizers, modular
  checksums) rather than provoked here.
- Exact ties: duplicate keys, duplicate (group, ts, tiebreak) rows,
  tied group counts for largest-remainder allocation, l_linenumber > 7
  so the *8 tiebreak collides.
- Documents with exotic Unicode: emoji/astral, combining marks, RTL,
  zero-width, NUL bytes, vertical tab, NEL, case-variant token twins,
  empty/whitespace-only/NULL text.

Deterministic (fixed seed); run:  python tools/adversarial_testdata.py [outdir]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 20260816
NS = 1_000_000_000

EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
RETURNFLAGS = ["A", "N", "R"]
LANGS = ["en", "de", "fr", "es", "pt"]
SOURCES = ["web", "wiki", "books", "code", "news", "forum"]

HOSTILE_TEXTS = [
    "emoji 😀😀 twice and 🚀 rocket",
    "astral \U0001F600\U0001D11E clef mix \U0001F984",
    "combining é acute vs é precomposed",
    "nul\x00byte inside token",
    "",
    "   ",
    "\t\n\x0b\f\r",
    "ZERO​WIDTH joined",
    "nbsp separated words",
    "İstanbul STRASSE ẞ sigma ΣΑΣ ΟΔΟΣ",
    "\ttab lead and trail\t",
    "line sep para sep nel\x85end",
    "𝔘𝔫𝔦𝔠𝔬𝔡𝔢 𝕗𝕣𝕒𝕜𝕥𝕦𝕣 𝖙𝖊𝖝𝖙",
    "Case case CASE cAsE casE",
    "word " * 200,
    "שלום rtl mixed ltr",
    "a\x0bb vertical tab split",
    "trailing spaces   ",
    "   leading spaces",
    "repeat repeat repeat repeat repeat",
    "the quick brown fox jumps over the lazy dog",
    "ДВЕ строки КИРИЛЛИЦЕЙ здесь",
    "ｆｕｌｌｗｉｄｔｈ ｌａｔｉｎ",
    "mixed123 numbers456 789tokens",
    "punct!!! ??? ... ,,, ;;;",
    # Unicode spaces at token/text EDGES: DuckDB's 1-arg trim() strips
    # these while Spark's trim() is ASCII-space-only -- the divergence the
    # round-8 fuzzer found (fixed by trim(text, ' ') in every oracle).
    "\u2008leading punctuation space",
    "trailing hair space\u200a",
    "\u00a0nbsp both ends\u00a0",
    "\u3000ideographic\u3000space\u3000",
    "\u1680ogham marks\u1680",
    "\u2028line sep\u2029para sep\u0085nel",
    "\ufeffbom prefix token",
    "\u205fmath space\u180emongolian",
]

# Magnitudes stay TAME (|x| <= ~9e5): every driver double-sum gate
# (q1, daily profiles, stream rollups) is green on the driver, so its
# data cannot carry magnitudes that make double summation order-visible
# — and that class is unfixable for plain SUM(double) anyway. Hostility
# here is in SIGN/boundary structure: -0.0, denormals, e6 half-way
# points, shortest-repr traps. NULLs/ties/Unicode carry the rest.
HOSTILE_DOUBLES = [
    -0.0, 0.0, 0.5, -0.5, 1.0000005, -1.0000005, 2.675, -2.675,
    0.1, 0.2, 0.30000000000000004, 1e-07, 5e-324, -5e-324,
    898765.4321095, -898765.4321095, 123456.1234565, 123.4567895,
    654321.000005, -654321.000005,
]


def _mix(rng, n, base, hostile, null_frac):
    """base draw with hostile values and NULLs spliced in."""
    out = base.astype(object)
    k = max(1, int(n * 0.02))
    idx = rng.choice(n, size=min(n, k * len(hostile)), replace=False)
    for j, i in enumerate(idx):
        out[i] = hostile[j % len(hostile)]
    nn = int(n * null_frac)
    if nn:
        out[rng.choice(n, size=nn, replace=False)] = None
    return out


def _poison_nonfinite(rng, arr, nan_frac, inf_frac=0.0):
    """Splice NaN (and optionally ±Inf) into a float object array.

    Round-9 class, probe-justified (VERDICT r8): the driver's
    ``events_nulltally_probe`` stayed RED while every finite-value
    checksum was GREEN — the driver's own data therefore carries
    non-finite floats that the two engines classified differently before
    the NaN ≙ NULL ingestion policy. Under the policy (Spark
    ``load_table`` + the oracle's normalized CTEs) NaN IS the missing
    marker, so these rows must collapse into the NULL cohort identically
    on both engines and in both oracle registration modes; ±Inf stays a
    value and must survive clamped quantizers identically."""
    n = len(arr)
    k = int(n * nan_frac)
    if k:
        arr[rng.choice(n, size=k, replace=False)] = float("nan")
    ki = int(n * inf_frac)
    if ki:
        idx = rng.choice(n, size=ki, replace=False)
        for j, i in enumerate(idx):
            arr[i] = float("inf") if j % 2 == 0 else float("-inf")
    return arr


def gen_events(rng, n=12000):
    # --- timestamps: ns epoch with sub-µs residue, several hostile bands
    ts = np.empty(n, dtype=object)
    for i in range(n):
        r = rng.random()
        if r < 0.04:
            # pre-1970 cluster with fractional SECONDS at whole-µs
            # granularity (floor != trunc at the seconds level). Sub-µs
            # residue is deliberately zero on negative ts: the engine
            # floors ns→µs (r9 policy, = a ns-native DuckDB's epoch_us)
            # while the LOCAL v1.0 parquet reader truncates toward zero —
            # a 1µs skew on negative residues that no oracle formulation
            # can reconcile locally and that does not exist on the
            # driver's ns-native reader. Positive-residue bands below
            # still exercise the sub-µs path (floor = trunc there).
            ts[i] = -int(rng.integers(1, 3 * 86400)) * NS + int(
                rng.integers(0, 1_000_000)
            ) * 1000
        elif r < 0.08:
            # straddle the epoch at whole µs: trunc maps [-1s, 1s) onto
            # second 0 (sub-µs zeroed for the same reader-skew reason)
            ts[i] = (int(rng.integers(-2 * NS, 2 * NS)) // 1000) * 1000
        elif r < 0.12:
            # within 1 µs below a second boundary
            base = 1_700_000_000 + int(rng.integers(0, 86400))
            ts[i] = base * NS - int(rng.integers(1, 1000))
        elif r < 0.16:
            # exact second boundaries (ties at floor-sec granularity)
            ts[i] = (1_700_000_000 + int(rng.integers(0, 3600))) * NS
        else:
            ts[i] = 1_700_000_000 * NS + int(
                rng.integers(0, 30 * 86400) * NS
            ) + int(rng.integers(0, NS))
    # duplicates: identical ts for runs of rows (LAG tie pressure)
    for s in range(0, n, 500):
        ts[s : s + 5] = ts[s]
    nn = int(n * 0.03)
    ts[rng.choice(n, size=nn, replace=False)] = None

    # --- event ids: mostly sequential, some huge (Σ overflows int64), dups
    eid = np.arange(1, n + 1, dtype=np.int64).astype(object)
    big_idx = rng.choice(n, size=8, replace=False)
    for i in big_idx:
        eid[i] = int(1.0e15) - int(rng.integers(0, 1000))
    eid[rng.choice(n, size=int(n * 0.01), replace=False)] = None
    dup_idx = rng.choice(n, size=int(n * 0.02), replace=False)
    for i in dup_idx:
        eid[i] = int(eid[(i + 1) % n] or 7)

    # --- user ids: skewed + negative + huge + NULL
    uid = rng.zipf(1.5, size=n).astype(np.int64) % 997
    uid = uid.astype(object)
    for i in rng.choice(n, size=40, replace=False):
        uid[i] = -int(rng.integers(1, 1000))
    for i in rng.choice(n, size=10, replace=False):
        uid[i] = int(1.0e12) + int(rng.integers(0, 100))
    uid[rng.choice(n, size=int(n * 0.03), replace=False)] = None

    etype = rng.choice(EVENT_TYPES, size=n).astype(object)  # NULL-free

    val = np.round(rng.random(n) * 500, 2).astype(object)
    val = _mix(rng, n, np.array(val, dtype=object), HOSTILE_DOUBLES, 0.04)
    val = _poison_nonfinite(rng, val, nan_frac=0.006, inf_frac=0.003)

    props = np.array(
        [
            None
            if rng.random() < 0.05
            else (
                '{"broken": '
                if rng.random() < 0.03
                else '{"k": %d, "s": "x"}' % rng.integers(0, 100)
            )
            for _ in range(n)
        ],
        dtype=object,
    )

    tbl = pa.table(
        {
            "event_id": pa.array(list(eid), type=pa.int64()),
            "ts": pa.array(
                [None if t is None else int(t) for t in ts],
                type=pa.timestamp("ns"),
            ),
            "user_id": pa.array(list(uid), type=pa.int64()),
            "event_type": pa.array(list(etype), type=pa.string()),
            "value": pa.array(
                [None if v is None else float(v) for v in val],
                type=pa.float64(),
            ),
            "props": pa.array(list(props), type=pa.string()),
        }
    )
    return tbl


def gen_orders(rng, n=15000):
    okey = np.arange(1, n + 1, dtype=np.int64).astype(object)
    for i in rng.choice(n, size=int(n * 0.01), replace=False):
        okey[i] = int(okey[(i + 3) % n] or 11)  # duplicate PKs
    okey[rng.choice(n, size=int(n * 0.005), replace=False)] = None

    ckey = rng.integers(1, 1500, size=n).astype(object)
    for i in rng.choice(n, size=60, replace=False):
        ckey[i] = int(rng.integers(100000, 200000))  # FK orphans
    ckey[rng.choice(n, size=int(n * 0.02), replace=False)] = None

    status = rng.choice(["O", "F", "P"], size=n).astype(object)
    for i in rng.choice(n, size=30, replace=False):
        status[i] = "X"
    status[rng.choice(n, size=int(n * 0.01), replace=False)] = None

    price = np.round(rng.random(n) * 500000, 2).astype(object)
    price = _mix(rng, n, np.array(price, dtype=object), HOSTILE_DOUBLES, 0.03)
    price = _poison_nonfinite(rng, price, nan_frac=0.005)
    # heavy exact ties inside each priority for median/MAD edges
    tie_idx = rng.choice(n, size=int(n * 0.1), replace=False)
    for i in tie_idx:
        price[i] = 77777.77

    # dates: µs timestamps, fractional seconds, pre-1970 cluster, NULLs
    date = np.empty(n, dtype=object)
    for i in range(n):
        r = rng.random()
        if r < 0.03:
            date[i] = -int(rng.integers(1, 200 * 86400)) * 1_000_000 + int(
                rng.integers(0, 1_000_000)
            )
        elif r < 0.05:
            date[i] = int(rng.integers(-2_000_000, 2_000_000))
        else:
            d = int(rng.integers(0, 2500 * 86400))
            date[i] = (694_224_000 + d) * 1_000_000 + int(
                rng.integers(0, 1_000_000)
            )
    date[rng.choice(n, size=int(n * 0.02), replace=False)] = None

    prio = rng.choice(PRIORITIES, size=n).astype(object)  # NULL-free

    return pa.table(
        {
            "o_orderkey": pa.array(list(okey), type=pa.int64()),
            "o_custkey": pa.array(list(ckey), type=pa.int64()),
            "o_orderstatus": pa.array(list(status), type=pa.string()),
            "o_totalprice": pa.array(
                [None if v is None else float(v) for v in price],
                type=pa.float64(),
            ),
            "o_orderdate": pa.array(
                [None if d is None else int(d) for d in date],
                type=pa.timestamp("us"),
            ),
            "o_orderpriority": pa.array(list(prio), type=pa.string()),
        }
    )


def gen_lineitem(rng, n=20000):
    okey = rng.integers(1, 15001, size=n).astype(object)
    okey[rng.choice(n, size=int(n * 0.01), replace=False)] = None
    pkey = rng.integers(1, 2001, size=n).astype(object)
    pkey[rng.choice(n, size=int(n * 0.01), replace=False)] = None
    skey = rng.integers(1, 101, size=n).astype(object)
    lnum = rng.integers(1, 8, size=n).astype(object)
    for i in rng.choice(n, size=200, replace=False):
        lnum[i] = int(rng.integers(8, 120))  # collide the *8 tiebreak
    qty = rng.integers(1, 51, size=n).astype("float64").astype(object)
    for i in rng.choice(n, size=300, replace=False):
        qty[i] = float(rng.integers(1, 100)) + 0.5  # fractional: CAST rounds
    for i in rng.choice(n, size=100, replace=False):
        qty[i] = -float(rng.integers(1, 10))
    qty[rng.choice(n, size=int(n * 0.02), replace=False)] = None
    price = np.round(rng.random(n) * 100000, 2).astype(object)
    price = _mix(rng, n, np.array(price, dtype=object), HOSTILE_DOUBLES, 0.03)
    price = _poison_nonfinite(rng, price, nan_frac=0.004)
    disc = np.round(rng.random(n) * 0.1, 2).astype(object)
    for i in rng.choice(n, size=100, replace=False):
        disc[i] = float(rng.choice([-0.5, 1.5, 2.0]))  # out of range
    disc[rng.choice(n, size=int(n * 0.02), replace=False)] = None
    tax = np.round(rng.random(n) * 0.08, 2).astype(object)
    rflag = rng.choice(RETURNFLAGS, size=n).astype(object)  # NULL-free
    lstat = rng.choice(["O", "F"], size=n).astype(object)
    ship = np.empty(n, dtype=object)
    for i in range(n):
        if rng.random() < 0.03:
            ship[i] = -int(rng.integers(1, 100 * 86400)) * 1_000_000
        else:
            ship[i] = (694_224_000 + int(rng.integers(0, 2500 * 86400))) * 1_000_000
    ship[rng.choice(n, size=int(n * 0.02), replace=False)] = None

    return pa.table(
        {
            "l_orderkey": pa.array(list(okey), type=pa.int64()),
            "l_partkey": pa.array(list(pkey), type=pa.int64()),
            "l_suppkey": pa.array(list(skey), type=pa.int64()),
            "l_linenumber": pa.array(
                [None if v is None else int(v) for v in lnum], type=pa.int32()
            ),
            "l_quantity": pa.array(
                [None if v is None else float(v) for v in qty],
                type=pa.float64(),
            ),
            "l_extendedprice": pa.array(
                [None if v is None else float(v) for v in price],
                type=pa.float64(),
            ),
            "l_discount": pa.array(
                [None if v is None else float(v) for v in disc],
                type=pa.float64(),
            ),
            "l_tax": pa.array(
                [None if v is None else float(v) for v in tax],
                type=pa.float64(),
            ),
            "l_returnflag": pa.array(list(rflag), type=pa.string()),
            "l_linestatus": pa.array(list(lstat), type=pa.string()),
            "l_shipdate": pa.array(
                [None if v is None else int(v) for v in ship],
                type=pa.timestamp("us"),
            ),
        }
    )


def gen_documents(rng, n=600):
    doc_id = np.arange(1, n + 1, dtype=np.int64).astype(object)
    for i in rng.choice(n, size=6, replace=False):
        doc_id[i] = int(doc_id[(i + 1) % n] or 3)  # duplicate ids
    doc_id[rng.choice(n, size=4, replace=False)] = None

    words = [
        "alpha", "beta", "gamma", "delta", "data", "model", "train",
        "token", "corpus", "sample", "Alpha", "BETA", "GaMmA",
        "naïve", "café", "straße", "öffnung",
    ]
    texts = []
    for i in range(n):
        r = rng.random()
        if r < 0.10:
            texts.append(HOSTILE_TEXTS[int(rng.integers(0, len(HOSTILE_TEXTS)))])
        elif r < 0.12:
            texts.append(None)
        else:
            k = int(rng.integers(5, 60))
            texts.append(
                " ".join(words[int(rng.integers(0, len(words)))] for _ in range(k))
            )
    lang = rng.choice(LANGS, size=n).astype(object)  # NULL-free
    # sources with exactly tied counts: first 5 sources get 96 docs each
    src = np.empty(n, dtype=object)
    for i in range(n):
        src[i] = SOURCES[i % 5] if i < 480 else SOURCES[5]
    nch = [None if t is None else len(t) for t in texts]
    return pa.table(
        {
            "doc_id": pa.array(list(doc_id), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(list(lang), type=pa.string()),
            "source": pa.array(list(src), type=pa.string()),
            "n_chars": pa.array(nch, type=pa.int64()),
        }
    )


def gen_customer(rng, n=1500):
    ckey = np.arange(1, n + 1, dtype=np.int64).astype(object)
    for i in rng.choice(n, size=10, replace=False):
        ckey[i] = int(ckey[(i + 2) % n] or 5)
    ckey[rng.choice(n, size=5, replace=False)] = None
    nkey = rng.integers(0, 25, size=n).astype(object)
    nkey[rng.choice(n, size=int(n * 0.02), replace=False)] = None
    seg = rng.choice(
        ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"],
        size=n,
    ).astype(object)
    bal = np.round(rng.random(n) * 10000 - 1000, 2).astype(object)
    bal = _mix(rng, n, np.array(bal, dtype=object), HOSTILE_DOUBLES, 0.02)
    bal = _poison_nonfinite(rng, bal, nan_frac=0.004)
    name = np.array(
        ["Customer#%09d" % i for i in range(1, n + 1)], dtype=object
    )
    for i in rng.choice(n, size=20, replace=False):
        name[i] = "Cüstömer 😀#%04d" % i
    return pa.table(
        {
            "c_custkey": pa.array(list(ckey), type=pa.int64()),
            "c_name": pa.array(list(name), type=pa.string()),
            "c_nationkey": pa.array(list(nkey), type=pa.int64()),
            "c_mktsegment": pa.array(list(seg), type=pa.string()),
            "c_acctbal": pa.array(
                [None if v is None else float(v) for v in bal],
                type=pa.float64(),
            ),
        }
    )


def gen_supplier(rng, n=100):
    skey = np.arange(1, n + 1, dtype=np.int64)
    nkey = rng.integers(0, 25, size=n).astype(object)
    bal = np.round(rng.random(n) * 10000 - 1000, 2).astype(object)
    bal[rng.choice(n, size=3, replace=False)] = None
    return pa.table(
        {
            "s_suppkey": pa.array(skey, type=pa.int64()),
            "s_name": pa.array(
                ["Supplier#%09d" % i for i in skey], type=pa.string()
            ),
            "s_nationkey": pa.array(list(nkey), type=pa.int64()),
            "s_acctbal": pa.array(
                [None if v is None else float(v) for v in bal],
                type=pa.float64(),
            ),
        }
    )


def gen_part(rng, n=2000):
    pkey = np.arange(1, n + 1, dtype=np.int64)
    colors = [
        "green", "blue", "red", "widget", "gear", "plate", "ÖLIVE",
        "naïve", "café",
    ]
    names = np.array(
        [
            " ".join(
                colors[int(rng.integers(0, len(colors)))] for _ in range(3)
            )
            for _ in range(n)
        ],
        dtype=object,
    )
    names[rng.choice(n, size=10, replace=False)] = None
    price = np.round(900 + (pkey % 200) + pkey / 10.0, 2).astype(object)
    return pa.table(
        {
            "p_partkey": pa.array(pkey, type=pa.int64()),
            "p_name": pa.array(list(names), type=pa.string()),
            "p_brand": pa.array(
                ["Brand#%d" % (i % 5 + 1) for i in pkey], type=pa.string()
            ),
            "p_type": pa.array(
                [
                    "%s %s" % (rng.choice(["STANDARD", "SMALL", "LARGE"]),
                               rng.choice(["PLATED", "BURNISHED"]))
                    for _ in pkey
                ],
                type=pa.string(),
            ),
            "p_size": pa.array(
                [int(i % 50 + 1) for i in pkey], type=pa.int32()
            ),
            "p_retailprice": pa.array(
                [float(v) for v in price], type=pa.float64()
            ),
        }
    )


def gen_nation_region():
    nations = [
        (i, "NATION%02d" % i, i % 5) for i in range(25)
    ]
    nat = pa.table(
        {
            "n_nationkey": pa.array([n[0] for n in nations], type=pa.int64()),
            "n_name": pa.array([n[1] for n in nations], type=pa.string()),
            "n_regionkey": pa.array([n[2] for n in nations], type=pa.int64()),
        }
    )
    reg = pa.table(
        {
            "r_regionkey": pa.array(list(range(5)), type=pa.int64()),
            "r_name": pa.array(
                ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
                type=pa.string(),
            ),
        }
    )
    return nat, reg


def gen_embeddings(rng, n=500, dim=64):
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    emb = [None if rng.random() < 0.01 else v.tolist() for v in vecs]
    vid = np.arange(1, n + 1, dtype=np.int64).astype(object)
    lab = rng.integers(0, 8, size=n).astype(object)
    lab[rng.choice(n, size=5, replace=False)] = None
    return pa.table(
        {
            "vec_id": pa.array(list(vid), type=pa.int64()),
            "embedding": pa.array(emb, type=pa.list_(pa.float32())),
            "label": pa.array(
                [None if v is None else int(v) for v in lab], type=pa.int32()
            ),
        }
    )


def main(outdir="advdata/sf_adv", seed=None):
    rng = np.random.default_rng(int(seed) if seed is not None else SEED)
    os.makedirs(outdir, exist_ok=True)
    tables = {
        "events": gen_events(rng),
        "orders": gen_orders(rng),
        "lineitem": gen_lineitem(rng),
        "documents": gen_documents(rng),
        "customer": gen_customer(rng),
        "supplier": gen_supplier(rng),
        "part": gen_part(rng),
        "embeddings": gen_embeddings(rng),
    }
    tables["nation"], tables["region"] = gen_nation_region()
    for name, tbl in tables.items():
        path = os.path.join(outdir, f"{name}.parquet")
        # store_schema=False keeps the written logical types authoritative
        # (events must round-trip as TIMESTAMP(NANOS), not pandas metadata)
        pq.write_table(tbl, path, store_schema=(name != "events"))
        print(f"wrote {path}: {tbl.num_rows} rows")
    # sanity: events must be INT64 TIMESTAMP(NANOS)
    sch = pq.ParquetFile(os.path.join(outdir, "events.parquet")).schema
    assert "NANOS" in str(sch.column(1).logical_type).upper() or "ns" in str(
        pq.ParquetFile(os.path.join(outdir, "events.parquet")).schema_arrow
    ), str(sch)
    print("events physical schema OK (ns)")


if __name__ == "__main__":
    main(*sys.argv[1:])
