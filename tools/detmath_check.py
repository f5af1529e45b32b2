#!/usr/bin/env python3
"""Cross-engine bit-equality check for the DetMath deterministic math
(src/main/scala/graft/functions/DetMath.scala).

Evaluates the DuckDB-SQL op sequence that DetMathSql emits (ln via
bit-length range reduction + 17-term atanh Horner; exp via Cody-Waite
reduction + 18-term Taylor + split 2^k scaling) against a CPython
reference computing the identical IEEE op sequence, and asserts
BIT-FOR-BIT equality over dense sweeps. CPython floats and the JVM both
use correctly-rounded IEEE-754 doubles for + - * /, so
DuckDB == CPython here implies DuckDB == the JVM impls the Spark-side
single-node expressions call — the chain DetMathSpec pins from the other
end. Dev tool only (the shipped engine has no Python deps).

Usage: python3 tools/detmath_check.py
"""
import duckdb, math, struct, sys

KS = list(range(3, 37, 2))          # atanh Horner coefficients 1/3 .. 1/35
NF = 18                             # exp Taylor terms
LN2 = 0.6931471805599453
LN2HI = 0.6931471803691238
LN2LO = 1.9082149292705877e-10
INVLN2 = 1.4426950408889634


def py_ln_long(x: int) -> float:
    e = x.bit_length() - 1
    m = float(x) / float(1 << e)
    z = (m - 1.0) / (m + 1.0)
    z2 = z * z
    p = 1.0 / KS[-1]
    for k in reversed(KS[:-1]):
        p = 1.0 / k + z2 * p
    return float(e) * LN2 + 2.0 * z * (1.0 + z2 * p)


def py_exp(x: float) -> float:
    v = x * INVLN2
    f = math.floor(v)
    k = int(f + 1.0 if v - f == 0.5 and v >= 0 else
            (f if v - f == 0.5 else round_rint(v)))
    r = (x - float(k) * LN2HI) - float(k) * LN2LO
    p = 1.0
    for n in range(NF, 0, -1):
        p = 1.0 + (r / n) * p
    k1 = int(k / 2)  # trunc toward zero, matching `//` on BIGINT and
    # the Column side's double-div-then-cast
    k2 = k - k1
    def sc(val, kk):
        return val * float(1 << kk) if kk >= 0 else val / float(1 << (-kk))
    return sc(sc(p, k1), k2)


def round_rint(v: float) -> float:
    # banker's rint is fine off-tie; ties handled by the caller
    import math as m
    fl = m.floor(v)
    fr = v - fl
    if fr < 0.5:
        return fl
    if fr > 0.5:
        return fl + 1.0
    return fl if fl % 2 == 0 else fl + 1.0


def sql_ln_horner(z2: str) -> str:
    s = "(CAST(1.0 AS DOUBLE)/CAST(%d.0 AS DOUBLE))" % KS[-1]
    for k in reversed(KS[:-1]):
        s = "((CAST(1.0 AS DOUBLE)/CAST(%d.0 AS DOUBLE)) + (%s * %s))" % (k, z2, s)
    return s


def sql_exp_horner(r: str) -> str:
    s = "CAST(1.0 AS DOUBLE)"
    for n in range(NF, 0, -1):
        s = "(CAST(1.0 AS DOUBLE) + (((%s) / CAST(%d.0 AS DOUBLE)) * %s))" % (r, n, s)
    return s


def bits(x: float) -> bytes:
    return struct.pack("d", x)


def check_ln(con) -> int:
    q = """
    WITH xs AS (SELECT range AS x FROM range(1, 300001)),
    a AS (SELECT x, (length(bin(CAST(x AS BIGINT))) - 1) AS e FROM xs),
    b AS (SELECT x, e, CAST(x AS DOUBLE) /
            CAST((CAST(1 AS BIGINT) << e) AS DOUBLE) AS m FROM a),
    c AS (SELECT x, e, (m - CAST(1.0 AS DOUBLE)) / (m + CAST(1.0 AS DOUBLE)) AS z FROM b),
    d AS (SELECT x, e, z, (z * z) AS z2 FROM c)
    SELECT x, (CAST(e AS DOUBLE) * CAST(0.6931471805599453 AS DOUBLE))
        + ((CAST(2.0 AS DOUBLE) * z) * (CAST(1.0 AS DOUBLE) + (z2 * %s))) AS lnx
    FROM d
    """ % sql_ln_horner("z2")
    bad = 0
    for x, v in con.execute(q).fetchall():
        if bits(py_ln_long(x)) != bits(v):
            bad += 1
    return bad


def check_exp(con) -> int:
    q = """
    WITH xs AS (SELECT CAST((range - 80000) / 1000.0 AS DOUBLE) AS x
                FROM range(0, 160001)),
    a AS (SELECT x, CAST(round(x * CAST(1.4426950408889634 AS DOUBLE)) AS BIGINT) AS k FROM xs),
    b AS (SELECT x, k,
            (x - (CAST(k AS DOUBLE) * CAST(0.6931471803691238 AS DOUBLE)))
              - (CAST(k AS DOUBLE) * CAST(1.9082149292705877e-10 AS DOUBLE)) AS r,
            (k // 2) AS k1 FROM a),
    c AS (SELECT x, k1, k - k1 AS k2, %s AS p FROM b),
    d AS (SELECT x, k2, CASE WHEN k1 >= 0
            THEN p * CAST((CAST(1 AS BIGINT) << k1) AS DOUBLE)
            ELSE p / CAST((CAST(1 AS BIGINT) << (-k1)) AS DOUBLE) END AS p1 FROM c)
    SELECT x, CASE WHEN k2 >= 0
        THEN p1 * CAST((CAST(1 AS BIGINT) << k2) AS DOUBLE)
        ELSE p1 / CAST((CAST(1 AS BIGINT) << (-k2)) AS DOUBLE) END AS ex
    FROM d
    """ % sql_exp_horner("r")
    bad = 0
    for x, v in con.execute(q).fetchall():
        if bits(py_exp(x)) != bits(v):
            bad += 1
    return bad


def main() -> int:
    con = duckdb.connect()
    bad_ln = check_ln(con)
    print(f"detLn  : {'OK' if bad_ln == 0 else 'FAIL'} "
          f"({bad_ln} bit-mismatches over x in [1, 3e5])")
    bad_exp = check_exp(con)
    print(f"detExp : {'OK' if bad_exp == 0 else 'FAIL'} "
          f"({bad_exp} bit-mismatches over x in [-80, 80] step 1e-3)")
    return 1 if bad_ln or bad_exp else 0


if __name__ == "__main__":
    sys.exit(main())
