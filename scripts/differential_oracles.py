"""Independent differential oracles for the two gates DuckDB cannot mirror.

q_sig_dedup and q_ann_search are built on xxhash64-seeded signatures and
seeded hyperplanes / k-means — none reproducible in DuckDB SQL. This module
gives each an INDEPENDENT ground truth instead of the rows-only check:

* q_sig_dedup / minhash family — truth = exact word-3-shingle Jaccard pairs
  computed by DuckDB SQL (a different engine and a different algorithm from
  the banded MinHash under test). Asserts precision == 1.0 (every reported
  pair is a true >=threshold pair with the exact Jaccard score) and
  recall >= 0.9.
* q_sig_dedup / simhash family — truth = brute-force Hamming over 64-bit
  SimHash signatures recomputed here in pure python + numpy (including a
  from-spec XXH64; nothing imported from the package under test). The gate
  runs at max_hamming=3 (the published web-scale operating point, Manku et
  al. WWW'07), which 4x16-bit banding provably covers — the check is exact
  TWO-SIDED set equality against brute force (precision AND completeness);
  above 3 it degrades to the pigeonhole-guaranteed subset plus a reported
  tail recall.
* q_ann_search / lsh_pair family — truth = exact cosine pairs from a numpy
  matmul over the raw parquet. Asserts precision == 1.0 (score equals the
  exact cosine) and recall >= 0.8.
* q_ann_search / ivf_topk family — truth = exact top-k for the query vector.
  Asserts recall >= 0.8 and score parity.

Used by scripts/check_correctness.py (gates report DIFF_MATCH instead of
NO_ORACLE) and by tests/test_differential_oracles.py, which also pins the
pure-python XXH64 against Spark's xxhash64 so the independence claim stays
verified.
"""

from __future__ import annotations

import re

# ---------------------------------------------------------------------------
# XXH64 from the public spec (github.com/Cyan4973/xxHash doc/xxhash_spec.md)
# ---------------------------------------------------------------------------
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _M64
    return (_rotl(acc, 31) * _P1) & _M64


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 of ``data`` (unsigned). Spark's xxhash64 default seed is 42."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i <= n - 8:
        k1 = _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = ((_rotl(h ^ k1, 27) * _P1) + _P4) & _M64
        i += 8
    if i <= n - 4:
        h = ((_rotl(h ^ (int.from_bytes(data[i : i + 4], "little") * _P1) & _M64, 23)
              * _P2) + _P3) & _M64
        h &= _M64
        i += 4
    while i < n:
        h = (_rotl(h ^ (data[i] * _P5) & _M64, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def _signed64(x: int) -> int:
    return x - (1 << 64) if x >= (1 << 63) else x


def xxh64_str(s: str, seed: int = 42) -> int:
    """Signed-long XXH64 of a string's UTF-8 bytes — Spark xxhash64(col)."""
    return _signed64(xxh64(s.encode("utf-8"), seed))


def xxh64_long(v: int, seed: int = 42) -> int:
    """Signed-long XXH64 of a long's 8 little-endian bytes — Spark
    xxhash64(bigint_col)."""
    return _signed64(xxh64((v & _M64).to_bytes(8, "little"), seed))


# ---------------------------------------------------------------------------
# Mirrors of the text/token pipeline (pure python, no package imports)
# ---------------------------------------------------------------------------
_TOKEN_RE = re.compile(r"[^a-z0-9']+")


def tokens_py(text: str) -> list[str]:
    """Mirror of operators/text.tokens: lowercase, split, drop empties."""
    return [t for t in _TOKEN_RE.split(text.lower()) if t]


def simhash_sig_py(toks: list[str]) -> int:
    """Signed-long 64-bit SimHash over a token array — mirrors
    dedup.simhash_votes + pack_votes (xxhash64 seed 42, +-1 votes per bit,
    bit set iff votes > 0)."""
    votes = [0] * 64
    for t in toks:
        h = xxh64(t.encode("utf-8"), 42)
        for b in range(64):
            votes[b] += 1 if (h >> b) & 1 else -1
    sig = 0
    for b in range(64):
        if votes[b] > 0:
            sig |= 1 << b
    return _signed64(sig)


# ---------------------------------------------------------------------------
# Gate-level differential checks (signature: rows, duckdb con, sf_dir)
# ---------------------------------------------------------------------------
_EXACT_JACCARD_SQL = """
    WITH toks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '[^a-z0-9'']+'),
                           x -> x <> '') AS tk
        FROM documents),
    d AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   range(1, greatest(len(tk) - 2, 1) + 1),
                   i -> array_to_string(list_slice(tk, i, i + 2), ' '))) AS sh
        FROM toks),
    sizes AS (SELECT doc_id, len(sh) AS sz FROM d),
    inv AS (SELECT doc_id, unnest(sh) AS s FROM d),
    common AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
        FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
    SELECT id_a, id_b, round(c / (sa.sz + sb.sz - c), 6) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE round(c / (sa.sz + sb.sz - c), 6) >= {threshold}
"""


def diff_sig_dedup(rows, con, sf_dir, threshold=0.2, max_hamming=3,
                   minhash_recall_bar=0.9):
    """Differential check for q_sig_dedup. Returns (ok, details)."""
    details = []
    ok = True

    # -- minhash family vs DuckDB exact-Jaccard truth ----------------------
    mh = {(r["id_a"], r["id_b"]): r["score"]
          for r in rows if r["method"] == "minhash"}
    truth = {(a, b): j for a, b, j in
             con.sql(_EXACT_JACCARD_SQL.format(threshold=threshold)).fetchall()}
    if not truth:
        return False, ["minhash: empty exact-Jaccard truth set"]
    # tolerance: half a round-6 ulp (5e-7, padded to 6e-7) — the gate's
    # score is Spark F.round (HALF_UP) while the truth is DuckDB round;
    # a rational jaccard landing exactly on a .5 rounding boundary may
    # legally differ by one round-6 step between the two (ADVICE r10)
    bad = [k for k, v in mh.items()
           if k not in truth or abs(truth[k] - v) > 6e-7]
    if bad:
        ok = False
        details.append(f"minhash precision FAIL: {len(bad)} bogus pairs, "
                       f"e.g. {bad[:3]}")
    recall = len(set(mh) & set(truth)) / len(truth)
    details.append(f"minhash recall {recall:.4f} over {len(truth)} true pairs"
                   f" (bar {minhash_recall_bar})")
    if recall < minhash_recall_bar:
        ok = False

    # -- simhash family vs brute-force Hamming over from-spec signatures ---
    import numpy as np

    sh = {(r["id_a"], r["id_b"]): r["score"]
          for r in rows if r["method"] == "simhash"}
    docs = con.sql("SELECT doc_id, text FROM documents").fetchall()
    sigs = np.array([simhash_sig_py(tokens_py(t)) for _, t in docs],
                    dtype=np.int64).view(np.uint64)
    ids = np.array([d for d, _ in docs])
    x = sigs[:, None] ^ sigs[None, :]
    ham = np.zeros(x.shape, dtype=np.int64)
    v = x.copy()
    for _ in range(64):
        ham += (v & np.uint64(1)).astype(np.int64)
        v >>= np.uint64(1)
    iu = np.triu_indices(len(ids), 1)
    truth_h = {}
    for i, j in zip(iu[0], iu[1]):
        if ham[i, j] <= max_hamming:
            a, b = int(ids[i]), int(ids[j])
            truth_h[(min(a, b), max(a, b))] = int(ham[i, j])
    bad = [k for k, v_ in sh.items()
           if k not in truth_h or truth_h[k] != int(v_)]
    if bad:
        ok = False
        details.append(f"simhash precision FAIL: {len(bad)} pairs with wrong"
                       f"/bogus hamming, e.g. {bad[:3]}")
    if max_hamming <= 3:
        # 4x16-bit banding provably covers hamming<=3 (pigeonhole), so at
        # the gate's operating point the check is exact TWO-SIDED set
        # equality against the brute-force truth
        missed = set(truth_h) - set(sh)
        if missed:
            ok = False
            details.append(
                f"simhash completeness FAIL: {len(missed)} hamming<="
                f"{max_hamming} pairs missed (banding guarantees them)")
        else:
            details.append(
                f"simhash: EXACT set equality — all {len(truth_h)} "
                f"hamming<={max_hamming} pairs found, none bogus")
    else:
        guaranteed = {k for k, h in truth_h.items() if h <= 3}
        missed = guaranteed - set(sh)
        if missed:
            ok = False
            details.append(
                f"simhash pigeonhole FAIL: {len(missed)} hamming<=3 "
                f"pairs missed (4x16-bit banding guarantees them)")
        total_recall = (len(set(sh) & set(truth_h)) / len(truth_h)
                        if truth_h else 1.0)
        details.append(
            f"simhash: {len(guaranteed)} guaranteed (<=3) pairs all found; "
            f"tail recall {total_recall:.4f} over {len(truth_h)} (<= "
            f"{max_hamming}) pairs — partial by design (pigeonhole bound)")
    return ok, details


def diff_ann_search(rows, con, sf_dir, threshold=0.35, k=10,
                    recall_bar=0.8):
    """Differential check for q_ann_search. Returns (ok, details)."""
    import numpy as np

    details = []
    ok = True
    data = con.sql(
        "SELECT vec_id, embedding FROM embeddings ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in data])
    V = np.array([r[1] for r in data], dtype=np.float64)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    C = Vn @ Vn.T

    # -- lsh_pair family ----------------------------------------------------
    lsh = {(r["id_a"], r["id_b"]): r["score"]
           for r in rows if r["method"] == "lsh_pair"}
    iu = np.triu_indices(len(ids), 1)
    cos = C[iu]
    pos = {}
    for i, j, c in zip(iu[0], iu[1], cos):
        a, b = int(ids[i]), int(ids[j])
        pos[(min(a, b), max(a, b))] = float(c)
    # tolerance bands keep float-order jitter out of the verdict: precision
    # admits >= threshold - 1e-5, the recall denominator requires
    # >= threshold + 1e-5
    bad = [p for p, s in lsh.items()
           if p not in pos or pos[p] < threshold - 1e-5
           or abs(round(pos[p], 6) - s) > 2e-6]
    if bad:
        ok = False
        details.append(f"lsh_pair precision FAIL: {len(bad)} pairs below "
                       f"threshold or score-mismatched, e.g. {bad[:3]}")
    denom = {p for p, c in pos.items() if c >= threshold + 1e-5}
    recall = len(denom & set(lsh)) / len(denom) if denom else 1.0
    details.append(f"lsh_pair recall {recall:.4f} over {len(denom)} true "
                   f"pairs (bar {recall_bar})")
    if recall < recall_bar:
        ok = False

    # -- ivf_topk family ----------------------------------------------------
    ivf = {r["id_b"]: r["score"] for r in rows if r["method"] == "ivf_topk"}
    q = int(np.where(ids == 0)[0][0])
    c0 = np.round(C[q], 6).copy()
    c0[q] = -2.0
    order = np.lexsort((ids, -c0))
    exact_top = [int(ids[i]) for i in order[:k]]
    score_bad = [i for i, s in ivf.items()
                 if abs(float(C[q][np.where(ids == i)[0][0]]) - s) > 2e-6]
    if score_bad:
        ok = False
        details.append(f"ivf_topk score FAIL: wrong cosines for {score_bad}")
    recall_ivf = len(set(exact_top) & set(ivf)) / k
    details.append(f"ivf_topk recall {recall_ivf:.4f} vs exact top-{k} "
                   f"(bar {recall_bar})")
    if recall_ivf < recall_bar:
        ok = False
    return ok, details


#: gate name -> check fn, consumed by scripts/check_correctness.py
DIFFERENTIAL = {
    "q_sig_dedup": diff_sig_dedup,
    "q_ann_search": diff_ann_search,
}
