"""Independent second implementations of the 8 self-golden queries.

The driver gate oracles these queries against recorded goldens
(goldens_sf001.json) — output of this repo's own code. This tool
recomputes each query's expected output FROM FIRST PRINCIPLES:
straight-line Python (big-int hashing, dict/set pipelines, quadratic
scans) over the raw sf0.01 parquet / regenerated synthetic inputs,
sharing NO code with libfilter_spark. Hash constants and seeds are
re-stated literally from the op specs (they are part of the contract,
like sha256's constants); everything else — shingling, banding,
capping, clustering, winnowing, ANN candidate generation — is an
independent implementation, so a logic bug in the library cannot
cancel out here.

Usage:
    python tools/independent_oracles.py [sf_dir] [query ...]

Compares each computed table against goldens_sf001.json and prints
one OK/FAIL line per query. Exit 1 on any mismatch.
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import sys
from bisect import bisect_left

import numpy as np

M64 = (1 << 64) - 1
M61 = (1 << 61) - 1


# --- shared primitive specs (constants restated from the op contract) ----

def splitmix64_seq(n: int, seed: int) -> list[int]:
    out = []
    for i in range(1, n + 1):
        z = (seed + i * 0x9E3779B97F4A7C15) & M64
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M64
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M64
        out.append(z ^ (z >> 31))
    return out


def tok_hash(t: str) -> int:
    """Token-hash spec: (head16 LE ×2, tail8, mid8 if >24B, length)
    mixed with the stated odd constants + splitmix avalanche."""
    e = t.encode("utf-8")
    h0 = int.from_bytes(e[:16].ljust(16, b"\0")[:8], "little")
    h1 = int.from_bytes(e[:16].ljust(16, b"\0")[8:], "little")
    tail = int.from_bytes(e[-8:].rjust(8, b"\0"), "little")
    mid = int.from_bytes(e[(len(e) >> 1) - 4:(len(e) >> 1) + 4],
                         "little") if len(e) > 24 else 0
    z = (h0 * 0x9E3779B97F4A7C15
         ^ h1 * 0xC2B2AE3D27D4EB4F
         ^ tail * 0x100000001B3
         ^ mid * 0xD6E8FEB86659FD93
         ^ len(e) * 0xFF51AFD7ED558CCD) & M64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M64
    return z ^ (z >> 31)


def shingle_set(text: str, width: int = 3) -> set[int]:
    tk = text.split()
    if len(tk) < width:
        tk = tk + ["\x00"] * (width - len(tk))
    th = [tok_hash(t) for t in tk]
    out = set()
    for i in range(len(th) - width + 1):
        acc = 0
        for j in range(width):
            acc = (acc * 1099511628211 + th[i + j]) & M64
        out.add(acc)
    return out


_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & M64


def xxh64_long(v: int, seed: int) -> int:
    """XXH64 of one 64-bit word (Spark hashLong spec)."""
    h = (seed + _P5 + 8) & M64
    k1 = (_rotl((v * _P2) & M64, 31) * _P1) & M64
    h ^= k1
    h = (_rotl(h, 27) * _P1 + _P4) & M64
    h ^= h >> 33
    h = (h * _P2) & M64
    h ^= h >> 29
    h = (h * _P3) & M64
    return h ^ (h >> 32)


def spark_xxhash64(vals: list[int]) -> int:
    """Spark's multi-column xxhash64: fold hashLong, seed 42."""
    h = 42
    for v in vals:
        h = xxh64_long(v & M64, h)
    return h


# --- corpora ------------------------------------------------------------

def load_docs(sf_dir: str) -> list[dict]:
    import pyarrow.parquet as pq
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    return t.to_pylist()


def load_embeddings(sf_dir: str):
    import pyarrow.parquet as pq
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    ids = t.column("vec_id").to_pylist()
    m = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    return ids, m


# --- minhash / simhash / cluster / winnow -------------------------------

def _bucket_pairs(buckets: dict, max_bucket: int) -> set[tuple]:
    """Banded candidate generation with the capped-bucket star rule:
    oversized buckets emit (hub=min, member) stars instead of the
    quadratic join."""
    cand = set()
    for members in buckets.values():
        if len(members) > max_bucket:
            hub = min(members)
            for m in members:
                if m != hub:
                    cand.add((hub, m) if hub < m else (m, hub))
        else:
            ms = sorted(set(members))
            for x in range(len(ms)):
                for y in range(x + 1, len(ms)):
                    cand.add((ms[x], ms[y]))
    return cand


def minhash_pairs_independent(docs, k=64, bands=16, width=3,
                              threshold=0.5, max_bucket=256):
    """(id_a, id_b, jaccard) rows of the minhash_lsh query."""
    a = [x % (M61 - 1) + 1 for x in splitmix64_seq(k, 0xA11CE)]
    b = [x % M61 for x in splitmix64_seq(k, 0xB0B)]
    sh = {d["doc_id"]: shingle_set(d["text"], width) for d in docs}
    sigs = {}
    for i, s in sh.items():
        if not s:
            sigs[i] = [M61] * k
        else:
            xs = [x % M61 for x in s]
            sigs[i] = [min((a[j] * x + b[j]) % M61 for x in xs)
                       for j in range(k)]
    rpb = k // bands
    buckets: dict = {}
    for i, sig in sigs.items():
        for bd in range(bands):
            h = spark_xxhash64(sig[bd * rpb:(bd + 1) * rpb])
            buckets.setdefault((bd, h), []).append(i)
    out = []
    for ia, ib in sorted(_bucket_pairs(buckets, max_bucket)):
        sa, sb = sh[ia], sh[ib]
        inter = len(sa & sb)
        union = len(sa) + len(sb) - inter
        jac = inter / union if union else 1.0
        if jac >= threshold:
            out.append((ia, ib, jac))
    return out


def q_dedup_minhash_lsh(sf_dir: str):
    return (["id_a", "id_b", "jaccard"],
            minhash_pairs_independent(load_docs(sf_dir)))


def simhash_value(text: str) -> int:
    tk = text.split()
    if not tk:
        return 0
    hs = [tok_hash(t) for t in tk]
    n = len(hs)
    out = 0
    for p in range(64):
        cnt = sum((h >> p) & 1 for h in hs)
        if 2 * cnt - n > 0:
            out |= 1 << p
    return out


def q_dedup_simhash(sf_dir: str, max_hamming=3, max_bucket=256):
    docs = load_docs(sf_dir)
    sh = {d["doc_id"]: simhash_value(d["text"]) for d in docs}
    buckets: dict = {}
    for i, v in sh.items():
        for bd in range(4):
            buckets.setdefault((bd, (v >> (16 * bd)) & 0xFFFF),
                               []).append(i)
    out = []
    for ia, ib in sorted(_bucket_pairs(buckets, max_bucket)):
        ham = bin(sh[ia] ^ sh[ib]).count("1")
        if ham <= max_hamming:
            out.append((ia, ib, ham))
    return ["id_a", "id_b", "hamming"], out


def q_dedup_cluster_keep(sf_dir: str):
    docs = load_docs(sf_dir)
    pairs = minhash_pairs_independent(docs)
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for ia, ib, _ in pairs:
        ra, rb = find(ia), find(ib)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    in_pair = {i for p in pairs for i in p[:2]}
    counts: dict = {}
    for d in docs:
        lang, i = d["lang"], d["doc_id"]
        n, kept = counts.get(lang, (0, 0))
        keep = i not in in_pair or find(i) == i
        counts[lang] = (n + 1, kept + (1 if keep else 0))
    return (["lang", "n_docs", "n_kept", "n_dropped"],
            [(lang, n, kept, n - kept)
             for lang, (n, kept) in sorted(counts.items())])


def winnow(text: str, k: int = 8, w: int = 4) -> set[int]:
    data = text.encode("utf-8")
    if len(data) < k:
        data = data + b"\0" * (k - len(data))
    n = len(data) - k + 1
    hs = []
    for i in range(n):
        acc = 0
        for j in range(k):
            acc = (acc * 257 + data[i + j]) & M64
        hs.append(acc)
    if n <= w:
        return {min(hs)}
    return {min(hs[i:i + w]) for i in range(n - w + 1)}


def q_doc_fingerprints(sf_dir: str):
    docs = load_docs(sf_dir)
    agg: dict = {}
    for d in docs:
        fp = winnow(d["text"])
        n, tot = agg.get(d["lang"], (0, 0))
        agg[d["lang"]] = (n + 1, tot + len(fp))
    return (["lang", "n_docs", "total_fingerprints"],
            [(lang, n, tot) for lang, (n, tot) in sorted(agg.items())])


# --- ANN ----------------------------------------------------------------

def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _exact_topk(ids, m, qidx, k=10):
    """Exact cosine top-k id sets per query (matmul, ties by id asc —
    the stated ordering contract)."""
    mn = _normalize(m)
    sims = mn @ mn[qidx].T  # (n, nq)
    out = {}
    for c, qi in enumerate(qidx):
        scored = [(-sims[i, c], ids[i]) for i in range(len(ids))
                  if ids[i] != ids[qi]]
        scored.sort()
        out[ids[qi]] = [i for _, i in scored[:k]]
    return out


def _hyperplanes(dim: int, n_bits: int, seed: int = 0x5EED) -> np.ndarray:
    raw = np.array(splitmix64_seq(dim * n_bits * 2, seed),
                   dtype=np.float64)
    u1 = np.clip(raw[:dim * n_bits] / 2.0**64, 1e-12, 1 - 1e-12)
    u2 = raw[dim * n_bits:] / 2.0**64
    g = np.sqrt(-2 * np.log(u1)) * np.cos(2 * np.pi * u2)
    return g.reshape(n_bits, dim)


def q_ann_lsh_recall(sf_dir: str, k=10, n_bits=8, probe_hamming=2):
    ids, m = load_embeddings(sf_dir)
    qidx = [i for i, v in enumerate(ids) if v < 10]
    exact = _exact_topk(ids, m, qidx, k)
    planes = _hyperplanes(64, n_bits)
    mn = _normalize(m)
    bits = (mn @ planes.T) > 0
    bucket = (bits * (1 << np.arange(n_bits))[None, :]).sum(axis=1)
    by_bucket: dict = {}
    for i, b in enumerate(bucket):
        by_bucket.setdefault(int(b), []).append(i)
    flips = [0] + [1 << i for i in range(n_bits)]
    if probe_hamming >= 2:
        flips += [(1 << i) | (1 << j) for i in range(n_bits)
                  for j in range(i + 1, n_bits)]
    out = []
    for qi in qidx:
        qb = int(bucket[qi])
        cand = set()
        for f in flips:
            cand.update(by_bucket.get(qb ^ f, []))
        cand.discard(qi)
        # elementwise-product cosine (the rerank path's arithmetic)
        scored = sorted((-(float((mn[c] * mn[qi]).sum())), ids[c])
                        for c in cand)
        approx = [i for _, i in scored[:k]]
        hits = len(set(approx) & set(exact[ids[qi]]))
        out.append((ids[qi], hits, hits / len(exact[ids[qi]])))
    return ["query_id", "n_hits", "recall"], out


def _train_centroids_independent(m: np.ndarray, k: int,
                                 iters: int = 8) -> np.ndarray:
    """Deterministic spherical k-means spec: maxmin init from vector
    0, Lloyd by cosine-argmax, empty clusters reseed to the
    worst-covered point, means renormalized."""
    mn = _normalize(m)
    k = min(k, len(mn))
    idx = [0]
    best = mn @ mn[0]
    for _ in range(1, k):
        nxt = int(np.argmin(best))
        idx.append(nxt)
        best = np.maximum(best, mn @ mn[nxt])
    c = mn[idx].copy()
    for _ in range(iters):
        assign = np.argmax(mn @ c.T, axis=1)
        for j in range(k):
            sel = assign == j
            if sel.any():
                c[j] = mn[sel].mean(axis=0)
            else:
                cover = (mn @ c.T).max(axis=1)
                c[j] = mn[int(np.argmin(cover))]
        c = _normalize(c)
    return c


def q_ann_ivf_recall(sf_dir: str, k=10, n_centroids=32, nprobe=8):
    ids, m = load_embeddings(sf_dir)
    order = np.argsort(ids, kind="stable")  # sample = lowest ids
    ids = [ids[i] for i in order]
    m = m[order]
    qidx = [i for i, v in enumerate(ids) if v < 10]
    exact = _exact_topk(ids, m, qidx, k)
    cents = _train_centroids_independent(m[:8192], n_centroids)
    mn = _normalize(m)
    assign = np.argmax(mn @ cents.T, axis=1)
    lists: dict = {}
    for i, a in enumerate(assign):
        lists.setdefault(int(a), []).append(i)
    out = []
    for qi in qidx:
        probes = np.argsort(-(mn[qi] @ cents.T))[:nprobe]
        cand = set()
        for p in probes:
            cand.update(lists.get(int(p), []))
        cand.discard(qi)
        scored = sorted((-(float((mn[c] * mn[qi]).sum())), ids[c])
                        for c in cand)
        approx = [i for _, i in scored[:k]]
        hits = len(set(approx) & set(exact[ids[qi]]))
        out.append((ids[qi], hits, len(exact[ids[qi]])))
    return ["query_id", "n_hits", "n_exact"], out


# --- synthetic source-code pipeline -------------------------------------

_SRC_LANGS = ["py", "c", "cpp", "java", "go", "js", "ts", "rs",
              "rb", "sh", "sql", "md"]
_SRC_SHARES = [0.35, 0.15, 0.10, 0.09, 0.07, 0.06, 0.05, 0.04, 0.03,
               0.03, 0.02, 0.01]
_SRC_TOKENS = (
    "def return if else for while import from class self lambda yield "
    "int float str list dict set tuple None True False assert raise try "
    "except with open print len range map filter sum min max sorted zip "
    "struct void static const char double long unsigned signed sizeof "
    "public private final override template typename namespace using "
    "func var let mut impl trait match enum pub crate mod fn go chan"
).split()


def _mix1(i: int, salt: int) -> int:
    z = (i + (salt * 0x9E3779B97F4A7C15) % (1 << 64)) & M64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M64
    return z ^ (z >> 31)


def q_source_code_pipeline(sf_dir: str, n_rows=20_000, seed=42,
                           n_repos=500):
    cum = []
    acc = 0.0
    for s in _SRC_SHARES:  # sequential cumsum, same rounding order
        acc += s
        cum.append(acc)
    dup_pool = max(16, n_rows // 256)
    log_r = math.log(n_repos)
    mega: dict = {}     # lang -> set of content keys in the mega-repo
    rest: list = []     # (lang, key) of non-mega rows
    for i in range(n_rows):
        u = _mix1(i, seed + 1) / 2.0**64
        zr = min(int(math.exp((_mix1(i, seed + 2) / 2.0**64) * log_r)
                     - 1), n_repos - 1)
        repo_id = 0 if u < 0.30 else 1 + zr
        lang = _SRC_LANGS[min(bisect_left(cum, _mix1(i, seed + 3)
                                          / 2.0**64),
                              len(_SRC_LANGS) - 1)]
        dup = _mix1(i, seed + 7) / 2.0**64 < 0.05
        cid = _mix1(i, seed + 8) % dup_pool if dup \
            else _mix1(i, seed + 9) | (1 << 63)
        nt = 8 + _mix1(cid, seed + 10) % 120
        toks = [_SRC_TOKENS[_mix1((cid + j) & M64, seed + 11)
                            % len(_SRC_TOKENS)]
                for j in range(nt)]
        content = f"// id {cid:x}\n" + " ".join(toks)
        key = hashlib.sha256(content.encode("utf-8")).digest()[:8]
        is_mega = repo_id == 0 and repo_id % 37 == 0  # org0/repo0
        if is_mega:
            mega.setdefault(lang, set()).add(key)
        else:
            rest.append((lang, key))
    agg: dict = {}
    for lang, key in rest:
        if key in mega.get(lang, ()):
            files, contents = agg.get(lang, (0, set()))
            contents = contents | {key}
            agg[lang] = (files + 1, contents)
    return (["lang", "n_dup_files", "n_dup_contents"],
            [(lang, files, len(contents))
             for lang, (files, contents) in sorted(agg.items())])


# --- multimodal ---------------------------------------------------------

def q_multimodal_feature_audit(sf_dir: str, n_rows=300, seed=7,
                               fps=0.5):
    kinds = ["image", "audio", "video"]
    agg: dict = {}
    frames = 0
    for i in range(n_rows):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * 4
        sha = hashlib.sha256(payload).hexdigest()[:16]
        n, shas = agg.get(kind, (0, set()))
        agg[kind] = (n + 1, shas | {sha})
        if kind == "video":
            duration_ms = i % 60000
            frames += max(1, int(duration_ms / 1000.0 * fps))
    return (["kind", "n_media", "n_distinct_payloads",
             "total_video_frames_planned"],
            [(kind, n, len(shas), frames)
             for kind, (n, shas) in sorted(agg.items())])


# --- harness ------------------------------------------------------------

COMPUTERS = {
    "doc_fingerprints": q_doc_fingerprints,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_simhash": q_dedup_simhash,
    "dedup_cluster_keep": q_dedup_cluster_keep,
    "ann_lsh_recall": q_ann_lsh_recall,
    "ann_ivf_recall": q_ann_ivf_recall,
    "source_code_pipeline": q_source_code_pipeline,
    "multimodal_feature_audit": q_multimodal_feature_audit,
}


def _canon(rows) -> list[tuple]:
    out = []
    for r in rows:
        c = []
        for v in r:
            if isinstance(v, bool):
                c.append(v)
            elif isinstance(v, float):
                c.append(repr(float(v)))
            elif isinstance(v, (int, np.integer)):
                c.append(int(v))
            else:
                c.append(str(v))
        out.append(tuple(c))
    return sorted(out)


def compare_to_golden(name: str, cols, rows, goldens) -> tuple[bool, str]:
    g = goldens[name]
    if list(cols) != list(g["columns"]):
        return False, f"columns {cols} != {g['columns']}"
    mine = _canon(rows)
    theirs = _canon(g["rows"])
    if mine == theirs:
        return True, f"{len(mine)} rows"
    extra = [r for r in mine if r not in theirs][:3]
    missing = [r for r in theirs if r not in mine][:3]
    return False, (f"{len(mine)} vs {len(theirs)} rows; "
                   f"extra={extra} missing={missing}")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(COMPUTERS)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "goldens_sf001.json")) as fh:
        goldens = json.load(fh)
    failed = 0
    for name in names:
        cols, rows = COMPUTERS[name](sf_dir)
        ok, msg = compare_to_golden(name, cols, rows, goldens)
        print(f"{name}: {'OK' if ok else 'FAIL'} ({msg})")
        failed += 0 if ok else 1
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
