"""DuckDB replay of the xxhash64-synthesized churn fixture — the SQL oracle
for ``churn_features_gold``.

The fixture (:mod:`.fixtures`) derives every column from
``xxhash64(id, seed, salt)`` uniforms. Spark's XxHash64 over fixed-width
inputs (reference: src/processing/feature_engineering.py consumes the
pandas-era fixture; Spark side is org.apache.spark.sql.catalyst.expressions.XxHash64,
whose per-field primitives are XXH64.hashLong / XXH64.hashInt) is ~15
wrap-around BIGINT operations per field — replayable in DuckDB with exact
mod-2^64 arithmetic:

- state lives in UBIGINT (bitwise xor/or/>> are native);
- multiply/add go through HUGEINT with 32-bit-limb decomposition
  (``(a*b) mod 2^64 = (alo*blo + ((ahi*blo + alo*bhi) mod 2^32 << 32))
  mod 2^64`` — every intermediate fits signed 128-bit);
- rotl(x, r) = ((x * 2^r) mod 2^64) | (x >> (64-r)).

Bit-parity vs ``F.xxhash64(id, lit, lit)`` verified exhaustively over
100k ids in tests/test_oracle_parity.py (r11) — zero mismatches.

Structural note: each operation becomes its OWN chained-CTE level.
DuckDB binds lateral column aliases by textual expansion, so an alias
referenced twice duplicates its defining expression — a ~45-step hash
chain written with lateral aliases explodes exponentially at bind time
(measured: minutes, unbounded). Nested subqueries bind linearly but blow
the PARSER's recursion guard near ~190 levels ("memory exhausted"); a
WITH chain is a flat list, so it parses in milliseconds at any length
while keeping per-reference column binding. The common prefix
``hashLong(id, 42) → hashInt(42, ·)`` is shared across all salts; only
the final ``hashInt(salt, ·)`` differs per uniform.

This makes "fixed-width xxhash64" SQL-replayable in general. The STRING
form is replayable too WHEN every input stays under 32 bytes (r12): a
sub-32-byte input never enters XXH64's 4-accumulator stripe loop — it
takes the fixed tail cascade (≤3 8-byte word rounds, one optional 4-byte
round, ≤3 single-byte rounds, fmix), which is the same wrap-around limb
arithmetic as the fixed-width path with length-conditional steps. See
:func:`xxhash64_ascii_short_sql`; the fixture shingle vocabulary maxes at
17 bytes (probed at sf0.001–sf1), so simhash_fingerprints' per-shingle
hashes are exactly replayable. Inputs ≥32 bytes or non-ASCII yield NULL —
a VISIBLE hash mismatch, never a silent wrong answer.
"""

from __future__ import annotations

_M64 = "18446744073709551616::HUGEINT"
# unsigned renderings of the five XXH64 primes
_P1 = "11400714785074694791"
_P2 = "14029467366897019727"
_P3 = "1609587929392839161"
_P4 = "9650029242287828579"
_P5 = "2870177450012600261"


class _XxhSqlGen:
    """Accumulates one chained CTE per 64-bit operation; columns named
    s0, s1, ... — see the module docstring for why flat CTEs, not lateral
    aliases or nested subqueries."""

    def __init__(self, base_sql: str, prefix: str = "x"):
        self.prefix = prefix
        self.ctes = [f"{prefix}0 AS ({base_sql})"]
        self.n = 0

    def step(self, expr: str) -> str:
        alias = f"s{self.n}"
        prev = f"{self.prefix}{self.n}"
        self.n += 1
        self.ctes.append(
            f"{self.prefix}{self.n} AS (SELECT *, {expr} AS {alias} FROM {prev})"
        )
        return alias

    @property
    def cte_list(self) -> str:
        """Comma-joined CTE definitions (no WITH keyword), final relation
        ``{prefix}{n}`` carries every step column."""
        return ",\n".join(self.ctes)

    @property
    def final(self) -> str:
        return f"{self.prefix}{self.n}"

    def mul64(self, a: str, b: str) -> str:
        ah, bh = f"CAST({a} AS HUGEINT)", f"CAST({b} AS HUGEINT)"
        return self.step(
            f"CAST(((({ah} % 4294967296) * ({bh} % 4294967296) + "
            f"((({ah} // 4294967296) * ({bh} % 4294967296) + "
            f"({ah} % 4294967296) * ({bh} // 4294967296)) % 4294967296) "
            f"* 4294967296) % {_M64}) AS UBIGINT)"
        )

    def add64(self, a: str, b: str) -> str:
        return self.step(
            f"CAST(((CAST({a} AS HUGEINT) + CAST({b} AS HUGEINT)) % {_M64}) "
            "AS UBIGINT)"
        )

    def rotl(self, x: str, r: int) -> str:
        return self.step(
            f"(CAST(((CAST({x} AS HUGEINT) * {1 << r}) % {_M64}) AS UBIGINT)"
            f" | (CAST({x} AS UBIGINT) >> {64 - r}))"
        )

    def xor(self, a: str, b: str) -> str:
        return self.step(f"xor(CAST({a} AS UBIGINT), CAST({b} AS UBIGINT))")

    def shr(self, x: str, r: int) -> str:
        return self.step(f"(CAST({x} AS UBIGINT) >> {r})")

    def fmix(self, h: str) -> str:
        h = self.xor(h, self.shr(h, 33))
        h = self.mul64(h, _P2)
        h = self.xor(h, self.shr(h, 29))
        h = self.mul64(h, _P3)
        return self.xor(h, self.shr(h, 32))

    def hash_long(self, inp: str, seed: str) -> str:
        """XXH64.hashLong(input, seed) — Spark's primitive for 8-byte fields."""
        h = self.add64(self.add64(seed, _P5), "8")
        k = self.mul64(self.rotl(self.mul64(inp, _P2), 31), _P1)
        h = self.xor(h, k)
        h = self.add64(self.mul64(self.rotl(h, 27), _P1), _P4)
        return self.fmix(h)

    def hash_int(self, inp: str, seed: str) -> str:
        """XXH64.hashInt(input, seed) — Spark's primitive for 4-byte fields."""
        h = self.add64(self.add64(seed, _P5), "4")
        h = self.xor(
            h, self.mul64(f"(CAST({inp} AS UBIGINT) % 4294967296)", _P1)
        )
        h = self.add64(self.mul64(self.rotl(h, 23), _P2), _P3)
        return self.fmix(h)

    def signed(self, x: str) -> str:
        """Reinterpret the UBIGINT state as Java's signed long (two's
        complement) — what Spark's xxhash64 column carries."""
        return self.step(
            f"CAST((CAST({x} AS HUGEINT) - CASE WHEN {x} >= "
            f"9223372036854775808::UBIGINT THEN {_M64} ELSE 0::HUGEINT END) "
            "AS BIGINT)"
        )

    def unsigned(self, x: str) -> str:
        """Reinterpret a signed BIGINT column as its raw 64-bit pattern
        (UBIGINT) — what Spark's XxHash64 hashes when a LONG field feeds a
        further hash (e.g. xxhash64(xxhash64(s), lit(j)))."""
        return self.step(
            f"CAST((CAST({x} AS HUGEINT) + CASE WHEN {x} < 0 "
            f"THEN {_M64} ELSE 0::HUGEINT END) AS UBIGINT)"
        )


def xxhash64_id_chain_sql(
    base_sql: str, salts: list[int], seed: int = 42, id_col: str = "iu"
) -> tuple[str, str, dict[int, str]]:
    """SQL computing Spark's ``xxhash64(id BIGINT, lit(seed) INT,
    lit(salt) INT)`` (expression seed 42) for every salt, sharing the
    per-row prefix ``hashLong(id, 42) → hashInt(seed, ·)``. Returns
    (cte definitions without WITH, final relation name,
    {salt: signed-hash column alias})."""
    g = _XxhSqlGen(base_sql)
    h1 = g.hash_long(id_col, "42")
    h2 = g.hash_int(str(seed), h1)
    out = {}
    for salt in salts:
        out[salt] = g.signed(g.hash_int(str(salt), h2))
    return g.cte_list, g.final, out


# Public alias: downstream oracle builders (minhash banding) chain their
# own hashLong/hashInt mixes onto the string-cascade output.
XxhSqlGen = _XxhSqlGen


def xxhash64_ascii_short_sql(
    base_sql: str, str_col: str, seed: int = 42, prefix: str = "x"
) -> tuple[str, str, str]:
    """SQL computing Spark's ``xxhash64(s STRING)`` for ASCII strings
    under 32 bytes — the XXH64 tail cascade (no stripe loop).

    Spark's XxHash64 over a string field is XXH64.hashUnsafeBytes on the
    UTF-8 bytes with seed 42: for len < 32 that is h = seed+P5+len, then
    len//8 word rounds over little-endian 8-byte words, one 4-byte round
    if ≥4 bytes remain, single-byte rounds for the rest, fmix. Every
    step is the same mod-2^64 limb arithmetic as the fixed-width chain
    above, made length-conditional with a CASE select per round (absent
    rounds compute on zero-padded values, then the CASE keeps the prior
    state). Bytes come from ``ascii(substr(s, i, 1))`` — exact for ASCII
    (and 0 past the end), which is why inputs that are non-ASCII or
    ≥32 bytes return NULL instead: a VISIBLE oracle mismatch, never a
    silently wrong hash. Bit-parity vs ``F.xxhash64(col)`` is pinned in
    tests/test_oracle_parity.py over every length 0..31 plus the corpus
    shingle vocabulary.

    Returns (cte definitions without WITH, final relation name, signed
    hash column alias). ``base_sql`` must project ``str_col`` plus any
    passthrough columns; ~60 chained CTE steps per call.
    """
    g = _XxhSqlGen(base_sql, prefix=prefix)
    n = g.step(f"strlen({str_col})")
    ok = g.step(
        f"({n} < 32 AND NOT regexp_matches({str_col}, '[^\\x00-\\x7f]'))"
    )
    bl = g.step(
        f"list_transform(range(1, 32), i -> "
        f"CAST(ascii(substr({str_col}, CAST(i AS INT), 1)) AS BIGINT))"
    )
    nw = g.step(f"({n} // 8)")
    has4 = g.step(f"(({n} - {nw} * 8) >= 4)")
    to = g.step(f"({nw} * 8 + CASE WHEN {has4} THEN 4 ELSE 0 END)")
    nt = g.step(f"({n} - {to})")
    words = [
        g.step(
            " + ".join(
                f"({bl}[{8 * k + j + 1}] << {8 * j})" for j in range(8)
            )
        )
        for k in range(3)
    ]
    c4 = g.step(
        " + ".join(f"({bl}[{nw} * 8 + {j + 1}] << {8 * j})" for j in range(4))
    )
    tails = [g.step(f"{bl}[{to} + {j + 1}]") for j in range(3)]
    # h = (seed + P5) + length  — seed+P5 folded to one literal
    h = g.add64(str((seed + 0x27D4EB2F165667C5) % (1 << 64)), n)
    for k, w in enumerate(words):
        k1 = g.mul64(g.rotl(g.mul64(w, _P2), 31), _P1)
        out = g.add64(g.mul64(g.rotl(g.xor(h, k1), 27), _P1), _P4)
        h = g.step(f"CASE WHEN {nw} > {k} THEN {out} ELSE {h} END")
    out4 = g.add64(g.mul64(g.rotl(g.xor(h, g.mul64(c4, _P1)), 23), _P2), _P3)
    h = g.step(f"CASE WHEN {has4} THEN {out4} ELSE {h} END")
    for j, t in enumerate(tails):
        outb = g.mul64(g.rotl(g.xor(h, g.mul64(t, _P5)), 11), _P1)
        h = g.step(f"CASE WHEN {nt} > {j} THEN {outb} ELSE {h} END")
    signed = g.signed(g.fmix(h))
    final_col = g.step(f"CASE WHEN {ok} THEN {signed} ELSE NULL END")
    return g.cte_list, g.final, final_col


def spark_round_sql(expr: str, digits: int) -> str:
    """Exact SQL replica of Spark's ``F.round(double, d)``.

    Spark's Round is ``BigDecimal.valueOf(x).setScale(d, HALF_UP)`` —
    i.e. it rounds the SHORTEST round-trip decimal representation
    (``Double.toString``), not the value's exact binary expansion.
    DuckDB's native ``round(DOUBLE, d)`` disagrees near half-points
    (measured: 26.064999999999998 → 26.07), and ``CAST(x AS
    DECIMAL(38,20))`` rounds the exact expansion, which disagrees the
    OTHER way when the shortest repr is the half-point itself (measured:
    a value printing as 98.235 whose exact expansion is 98.23499…).
    ``CAST(x AS VARCHAR)`` is DuckDB's shortest round-trip printer, so
    VARCHAR → DECIMAL → round(half-away) replays Spark bit-for-bit on
    non-negative values (HALF_UP == half-away for positives; verified
    0/1000 mismatches on three rounds over the fixture id range)."""
    return (
        f"CAST(round(CAST(CAST(({expr}) AS VARCHAR) AS DECIMAL(38,20)), "
        f"{digits}) AS DOUBLE)"
    )


def _u_expr(h: str) -> str:
    """`_u` from :mod:`.fixtures`: pmod(hash, 1e6) / 1e6 — same IEEE ops.

    Every fractional literal in this module is CAST to DOUBLE: DuckDB
    parses ``0.4`` / ``1000000.0`` as DECIMAL and computes EXACT decimal
    arithmetic — measured against the engine as 48 one-ulp rfm_score
    diffs plus one floor-boundary flip (a u·3651 product landing within
    an ulp of an integer), all gone under double semantics."""
    return (
        f"(((({h} % 1000000) + 1000000) % 1000000) "
        "/ CAST(1000000.0 AS DOUBLE))"
    )


def churn_features_gold_oracle(n: int = 1000, seed: int = 42) -> str:
    """The full DuckDB replay of queries/features.py::churn_features_gold:
    synthesize the needed fixture columns for ids 0..n-1 by exact xxhash64
    arithmetic, then apply the feature formulas of the output's seven
    columns (rfm_score / engagement_ratio / clv_proxy are plain row
    arithmetic; is_high_value needs the two exact 0.8-quantiles — Spark
    ``percentile`` ↔ DuckDB ``quantile_cont``, safe here because the gmv/
    aov grids are 0.01-steps and n=1000 puts the interpolated threshold
    strictly between grid points, so a last-ulp formula difference cannot
    flip any comparison). The fixture is n-fixed — the oracle is
    SF-invariant by construction, like the engine query."""
    salts = [3, 5, 7, 13, 15, 16, 18, 21, 28, 30]
    base = (
        f"SELECT i, CAST(i AS UBIGINT) AS iu FROM range(0, {n}) t(i)"
    )
    ctes, final, h = xxhash64_id_chain_sql(base, salts, seed=seed)
    u = {s: _u_expr(h[s]) for s in salts}
    # Spark-round replicas (see spark_round_sql): aov feeds gmv, gmv is
    # reused verbatim for rfm_monetary — identical expression text, like
    # the engine reusing the same Column
    aov = spark_round_sql(f"{u[16]} * CAST(200 AS DOUBLE)", 2)
    gmv = spark_round_sql(
        f"{aov} * CAST(floor({u[15]} * 100) AS INT)", 2
    )
    rr = spark_round_sql(f"{u[21]} * CAST(0.3 AS DOUBLE)", 4)
    # fixture columns (fixtures.py::synthesize_users_raw lines, same order
    # of IEEE ops; floor→BIGINT matches Spark floor→long→int values)
    users = f"""
    SELECT
      'U' || lpad(CAST(i AS VARCHAR), 5, '0')            AS user_id,
      CAST(floor({u[3]} * 3651) AS INT)                  AS reg_days,
      CAST(floor({u[7]} * 200) AS INT)                   AS sessions_90d,
      CAST(floor({u[5]} * (CAST(floor({u[7]} * 200) AS INT) + 1)) AS INT)
                                                         AS sessions_30d,
      CAST(floor({u[13]} * 30) AS INT)                   AS orders_90d,
      CAST(floor({u[15]} * 100) AS INT)                  AS orders_2024,
      {aov}                                              AS aov_2024,
      {gmv}                                              AS gmv_2024,
      CAST(floor({u[18]} * 366) AS INT)                  AS days_since_last_order,
      {rr}                                               AS refund_rate_2024,
      CAST(floor({u[28]} * 366) AS INT)                  AS rfm_recency,
      CAST(floor({u[15]} * 100) AS INT)                  AS rfm_frequency,
      {gmv}                                              AS rfm_monetary,
      CAST({u[30]} < CAST(0.3 AS DOUBLE) AS INT)                         AS churn_label
    FROM {final}
    """
    return f"""
    WITH {ctes},
    users AS ({users}),
    q AS (
      SELECT quantile_cont(gmv_2024, 0.8) AS gmv_q80,
             quantile_cont(aov_2024, 0.8) AS aov_q80
      FROM users
    )
    SELECT
      user_id,
      rfm_recency * CAST(0.4 AS DOUBLE) + rfm_frequency * CAST(0.3 AS DOUBLE)
        + rfm_monetary * CAST(0.3 AS DOUBLE)
        AS rfm_score,
      sessions_30d / (CASE WHEN sessions_90d = 0 THEN 1 ELSE sessions_90d END)
        AS engagement_ratio,
      gmv_2024 * (365 / (CASE WHEN reg_days = 0 THEN 1 ELSE reg_days END))
        AS clv_proxy,
      CAST((days_since_last_order > 90) OR (sessions_30d = 0)
           OR (refund_rate_2024 > CAST(0.1 AS DOUBLE)) AS INT) AS is_at_risk,
      CAST((gmv_2024 > gmv_q80) OR (aov_2024 > aov_q80) AS INT)
        AS is_high_value,
      churn_label
    FROM users, q
    ORDER BY user_id
    """
