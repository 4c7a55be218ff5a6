"""Decode the `xfil_*` exfiltration-probe rows of a CORRECTNESS_r{N}.json.

Each xfil probe materializes one integer fact AS its row count on each
engine (see the family comment in __spark_entry__.py): the driver's
correctness artifact records `spark_rows` (the fact as Spark computed it
from the RAW parquet) and `oracle_rows` (the same fact as the driver's
DuckDB oracle computed it through its own registration path). This tool
turns those pairs back into a read-divergence report, so the next round
starts from named facts instead of re-deriving them from raw JSON.

Usage: python tools/decode_xfil.py CORRECTNESS_r09.json
"""

from __future__ import annotations

import json
import sys

_TS = {1: "int64-ns(bigint)", 2: "timestamp[us] instant", 3: "timestamp_ntz",
       4: "date", 6: "bigint", 9: "other"}
_INT = {1: "bigint", 2: "double(drifted)", 3: "int32", 4: "float",
        5: "decimal", 9: "other"}
_VAL = {1: "double", 2: "float", 5: "decimal", 9: "other"}


def _dtypes3(code: int, spaces) -> str:
    a, b, c = code % 10, (code // 10) % 10, (code // 100) % 10
    return " + ".join(
        f"{name}={space.get(v, v)}" for (name, space), v in zip(spaces, (a, b, c))
    )


def _events_dtypes(code: int) -> str:
    return _dtypes3(code, [("ts", _TS), ("user_id", _INT), ("value", _VAL)])


def _orders_dtypes(code: int) -> str:
    return _dtypes3(
        code, [("o_totalprice", _VAL), ("o_orderdate", _TS), ("o_custkey", _INT)]
    )


def _null_lst(code: int) -> str:
    return (f"null_lang={code % 31} null_source={(code // 31) % 31} "
            f"null_text={(code // 961) % 31} (each capped at 30)")


def _ver(code: int) -> str:
    return ".".join(str(code))  # 412 -> "4.1.2", 100 -> "1.0.0"


# name -> (what the integer IS, optional decoder for packed codes)
PROBES = {
    "xfil_env_versions": ("engine version digits (spark side = PySpark, "
                          "oracle side = DuckDB)", _ver),
    "xfil_events_rows": ("events row count", None),
    "xfil_events_null_ts": ("NULL ts rows", None),
    "xfil_events_null_user": ("NULL user_id rows", None),
    "xfil_events_nan_user": ("NaN user_id rows (float-drift marker: >0 on "
                             "exactly one side = that side reads the column "
                             "as float with NaN)", None),
    "xfil_events_null_value": ("NULL value rows", None),
    "xfil_events_nan_value": ("NaN value rows", None),
    "xfil_events_inf_value": ("±Inf value rows", None),
    "xfil_events_zero_value": ("value == 0 rows", None),
    "xfil_events_distinct_user": ("distinct user_id (NULL excluded by "
                                  "count-distinct)", None),
    "xfil_events_type_user_pairs": ("distinct (event_type, user_id) pairs",
                                    None),
    "xfil_events_ns_residue": ("ts rows with sub-µs residue (raw ns read; "
                               "0 on the oracle side = its reader already "
                               "truncated to µs)", None),
    "xfil_events_pre1970": ("ts rows before the epoch", None),
    "xfil_events_dtypes": ("packed events dtype descriptor", _events_dtypes),
    "xfil_orders_rows": ("orders row count", None),
    "xfil_orders_null_custkey": ("NULL o_custkey rows", None),
    "xfil_orders_nan_custkey": ("NaN o_custkey rows (float-drift marker)",
                                None),
    "xfil_orders_tp_missing": ("o_totalprice NULL-or-NaN rows", None),
    "xfil_orders_tp_chk": ("Σ-pmod e2 residue of finite o_totalprice "
                           "(mod 99991)", None),
    "xfil_orders_med2": ("(lo+hi median ranks of e2 o_totalprice) mod 99991",
                         None),
    "xfil_orders_dtypes": ("packed orders dtype descriptor", _orders_dtypes),
    "xfil_li_rows": ("lineitem row count", None),
    "xfil_li_q_missing": ("l_quantity NULL-or-NaN rows", None),
    "xfil_li_q_frac": ("finite l_quantity rows with fractional part", None),
    "xfil_li_ep_chk": ("Σ-pmod e2 residue of finite l_extendedprice "
                       "(mod 99991)", None),
    "xfil_docs_rows": ("documents row count", None),
    "xfil_docs_null_id": ("NULL doc_id rows (the slice-complement cohort)",
                          None),
    "xfil_docs_nan_id": ("NaN doc_id rows (float-drift marker)", None),
    "xfil_docs_neg_id": ("negative doc_id rows", None),
    "xfil_docs_dup_id": ("duplicate non-NULL doc_id row surplus", None),
    "xfil_docs_null_lst": ("packed (lang, source, text) NULL tallies",
                           _null_lst),
}


def main(path: str) -> int:
    with open(path) as f:
        rec = json.load(f)
    hits = [(n, rec[n]) for n in PROBES if n in rec]
    if not hits:
        print(f"no xfil_* rows in {path}")
        return 1
    agree = diverge = 0
    print(f"{path}: {len(hits)} xfil probes present\n")
    for name, r in hits:
        s, o = r.get("spark_rows"), r.get("oracle_rows")
        what, dec = PROBES[name]
        if r.get("err"):
            print(f"ERR  {name}: {r['err']}")
            continue
        if o is None:
            print(f"??   {name}: spark={s} (no oracle_rows recorded) — {what}")
            continue
        if name == "xfil_env_versions":
            # the two sides are DIFFERENT quantities by design
            print(f"INFO {name}: PySpark={_ver(s)} DuckDB={_ver(o)}")
            continue
        tag = "SAME" if s == o else "DIFF"
        agree += tag == "SAME"
        diverge += tag == "DIFF"
        line = f"{tag} {name}: spark={s} oracle={o} — {what}"
        if dec and s is not None:
            line += f"\n      spark: {dec(s)}"
            if s != o:
                line += f"\n      oracle: {dec(o)}"
        print(line)
    print(f"\n{agree} agree, {diverge} diverge")
    print("Reading: spark side = raw parquet ground truth; oracle side = "
          "the driver's registration path. A DIFF names a read-level "
          "divergence mechanism; a SAME retires one.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1] if len(sys.argv) > 1 else
                          "CORRECTNESS_r09.json"))
