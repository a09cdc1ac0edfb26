"""Binary bag-of-words vocabulary: hierarchical k-medians over ORB
descriptors, batched tree descent, dense TF-IDF scoring on the MXU.

TPU-native replacement for the reference's DBoW2 vocabulary
(reference: Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h — k-branching
tree built by k-medians over binary descriptors, transform() descends the
tree per descriptor, L1 scoring between sparse BoW vectors;
KeyFrameDatabase's inverted file include/KeyFrameDatabase.h:106). Design
shift: BoW vectors are kept DENSE ([W] float32, W ~ 10k) so database
similarity is one [K, W] @ [W] matvec on the MXU — the inverted index is a
CPU-era optimization that a matmul replaces outright. The reference ships a
pre-trained 1e6-word vocabulary; here the vocabulary is trained on-the-fly
from the target domain (train()) since binary-compatibility with ORBvoc is
not a goal.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


_POP8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None],
                      axis=1).sum(1).astype(np.uint8)


def _popcount_np(x: np.ndarray) -> np.ndarray:
    return _POP8[x.view(np.uint8)].sum(-1, dtype=np.int32)


def _hamming_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """[N,8] x [M,8] uint32 -> [N,M] int Hamming (chunked over N so the
    intermediate xor stays bounded for vocabulary-scale N)."""
    n, m = a.shape[0], b.shape[0]
    out = np.empty((n, m), np.int32)
    step = max(1, (1 << 21) // max(m, 1))  # <=64 MB xor intermediates
    for i in range(0, n, step):
        x = a[i:i + step, None, :] ^ b[None, :, :]
        out[i:i + step] = _POP8[x.view(np.uint8)].sum(-1, dtype=np.int32)
    return out


def _kmedians_binary(desc: np.ndarray, k: int, rng, iters: int = 8):
    """Binary k-medians (majority-vote medians) over [N,8] uint32."""
    n = len(desc)
    k = min(k, n)
    centers = desc[rng.choice(n, k, replace=False)]
    bits = np.unpackbits(desc.view(np.uint8), axis=-1)  # [N, 256]
    for _ in range(iters):
        d = _hamming_np(desc, centers)
        assign = d.argmin(axis=1)
        new_centers = []
        for c in range(k):
            sel = assign == c
            if not sel.any():
                new_centers.append(desc[rng.integers(n)])
                continue
            maj = (bits[sel].mean(axis=0) > 0.5).astype(np.uint8)
            new_centers.append(np.packbits(maj).view(np.uint32))
        centers = np.stack(new_centers)
    return centers, assign


class Vocabulary(NamedTuple):
    """Flattened k^L tree. Level l has k^(l+1) nodes stored contiguously."""

    k: int                     # branching factor
    depth: int                 # number of levels below the root
    nodes: jnp.ndarray         # [n_nodes, 8] uint32 node centroids
    level_offset: tuple        # python ints, offset of each level's nodes
    word_weights: jnp.ndarray  # [n_words] idf weights
    n_words: int

    def save(self, path: str):
        np.savez(
            path, k=self.k, depth=self.depth, nodes=np.asarray(self.nodes),
            level_offset=np.asarray(self.level_offset),
            word_weights=np.asarray(self.word_weights),
        )

    @staticmethod
    def load(path: str) -> "Vocabulary":
        z = np.load(path)
        return Vocabulary(
            int(z["k"]), int(z["depth"]), jnp.asarray(z["nodes"]),
            tuple(int(x) for x in z["level_offset"]),
            jnp.asarray(z["word_weights"]), int(z["word_weights"].shape[0]),
        )


def train(descriptors: np.ndarray, k: int = 10, depth: int = 3,
          seed: int = 0) -> Vocabulary:
    """Train a k^depth-word vocabulary with hierarchical binary k-medians
    (the DBoW2 construction re-derived; reference:
    TemplatedVocabulary::create)."""
    rng = np.random.default_rng(seed)
    desc = np.ascontiguousarray(descriptors.astype(np.uint32))

    nodes_per_level = []
    # level 0: k clusters of everything
    level_sets = [desc]
    for l in range(depth):
        centers_this_level = []
        next_sets = []
        for subset in level_sets:
            if len(subset) == 0:
                subset = desc[rng.choice(len(desc), 1)]
            c, assign = _kmedians_binary(subset, k, rng)
            # pad to exactly k centers (duplicate) so the tree stays regular
            if len(c) < k:
                c = np.concatenate([c, np.tile(c[-1:], (k - len(c), 1))])
            centers_this_level.append(c)
            for ci in range(k):
                next_sets.append(subset[assign == ci])
        nodes_per_level.append(np.concatenate(centers_this_level))
        level_sets = next_sets

    offsets = []
    off = 0
    for lv in nodes_per_level:
        offsets.append(off)
        off += len(lv)
    nodes = np.concatenate(nodes_per_level)
    n_words = k ** depth

    # idf weights from the training set
    voc = Vocabulary(k, depth, jnp.asarray(nodes), tuple(offsets),
                     jnp.ones((n_words,), jnp.float32), n_words)
    words = np.asarray(quantize(voc, jnp.asarray(desc)))
    counts = np.bincount(words, minlength=n_words).astype(np.float32)
    n_docs = max(len(desc) / 500.0, 1.0)  # pseudo-documents of 500 feats
    idf = np.log(np.maximum(n_docs, 2.0) / (1.0 + counts / 500.0))
    idf = np.maximum(idf, 0.05).astype(np.float32)
    return voc._replace(word_weights=jnp.asarray(idf))


class GeneralVocabulary(NamedTuple):
    """Irregular-tree vocabulary (explicit children table) for pre-trained
    DBoW2 vocabularies like ORBvoc (reference:
    Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h:1467-1517 loadFromTextFile —
    nodes carry parent id + 32 descriptor bytes + weight; leaves become words
    in node-id order). The descent is still fully batched: each level is one
    masked [N, k] Hamming argmin over the children table."""

    k: int                    # max branching factor
    depth: int                # tree depth (descent iterations)
    nodes: jnp.ndarray        # [n_nodes, 8] uint32 node descriptors
    children: jnp.ndarray     # [n_nodes, k] int32; -1 = no child
    word_id: jnp.ndarray      # [n_nodes] int32; -1 = internal node
    word_weights: jnp.ndarray  # [n_words] float32 (idf)
    n_words: int

    def save(self, path: str):
        np.savez(path, k=self.k, depth=self.depth,
                 nodes=np.asarray(self.nodes),
                 children=np.asarray(self.children),
                 word_id=np.asarray(self.word_id),
                 word_weights=np.asarray(self.word_weights))

    @staticmethod
    def load(path: str) -> "GeneralVocabulary":
        z = np.load(path)
        return GeneralVocabulary(
            int(z["k"]), int(z["depth"]), jnp.asarray(z["nodes"]),
            jnp.asarray(z["children"]), jnp.asarray(z["word_id"]),
            jnp.asarray(z["word_weights"]), int(z["word_weights"].shape[0]))


def load_dbow2_text(path: str) -> GeneralVocabulary:
    """Parse a DBoW2 text vocabulary (the ORBvoc.txt format).

    Format (reference: TemplatedVocabulary::loadFromTextFile,
    Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h:1467-1517): header line
    ``k L scoring weighting``; then one line per non-root node in node-id
    order: ``parent_id is_leaf b0 .. b31 weight`` with 32 descriptor bytes.
    Leaves get word ids in node-id order.
    """
    with open(path, "r") as f:
        header = f.readline().split()
        k, L = int(header[0]), int(header[1])
        parents, leaf, descs, weights = [], [], [], []
        for line in f:
            parts = line.split()
            if len(parts) < 35:
                continue
            parents.append(int(parts[0]))
            leaf.append(bool(int(parts[1])))
            descs.append([int(b) for b in parts[2:34]])
            weights.append(float(parts[34]))
    return _build_general(
        np.asarray(parents, np.int64), np.asarray(leaf, bool),
        np.asarray(descs, np.uint8), np.asarray(weights, np.float32), k, L)


def save_dbow2_text(voc: GeneralVocabulary, path: str):
    """Write the DBoW2 text format (round-trips through load_dbow2_text)."""
    nodes = np.asarray(voc.nodes).view(np.uint8).reshape(-1, 32)
    children = np.asarray(voc.children)
    word_id = np.asarray(voc.word_id)
    weights = np.asarray(voc.word_weights)
    n = nodes.shape[0]
    parent = np.zeros(n, np.int32)
    for p in range(n):
        for c in children[p]:
            if c > 0 and c != p and parent[c] == 0:
                parent[c] = p
    with open(path, "w") as f:
        f.write(f"{voc.k} {voc.depth} 0 0\n")
        for i in range(1, n):
            is_leaf = int(word_id[i] >= 0)
            wt = weights[word_id[i]] if is_leaf else 0.0
            b = " ".join(str(int(x)) for x in nodes[i])
            f.write(f"{parent[i]} {is_leaf} {b} {wt:.6f}\n")


def _build_general(parents: np.ndarray, leaf: np.ndarray,
                   desc_bytes: np.ndarray, weights: np.ndarray,
                   k: int, L: int) -> GeneralVocabulary:
    """Assemble a GeneralVocabulary from per-node arrays (nodes 1..n in file
    order; vectorized children/word-id table construction)."""
    n = len(parents) + 1  # + root
    db = np.zeros((n, 32), np.uint8)
    db[1:] = desc_bytes
    nodes = db.view(np.uint32)

    children = np.full((n, k), -1, np.int32)
    ids = np.arange(1, n, dtype=np.int32)
    order = np.argsort(parents, kind="stable")
    ps = parents[order]
    # slot of each child within its parent (cumcount per parent)
    first = np.r_[True, ps[1:] != ps[:-1]]
    grp_start = np.maximum.accumulate(np.where(first, np.arange(len(ps)), 0))
    slot = np.arange(len(ps)) - grp_start
    ok = slot < k
    children[ps[ok], slot[ok]] = ids[order][ok]

    word_id = np.full(n, -1, np.int32)
    leaf_ids = ids[leaf]
    word_id[leaf_ids] = np.arange(len(leaf_ids), dtype=np.int32)
    w = weights[leaf]
    # leaves keep themselves as their single child so early-terminating
    # branches survive the fixed-depth batched descent
    children[leaf_ids, 0] = leaf_ids
    return GeneralVocabulary(
        k, L, jnp.asarray(np.ascontiguousarray(nodes)),
        jnp.asarray(children), jnp.asarray(word_id),
        jnp.asarray(np.asarray(w, np.float32)), int(len(leaf_ids)))


_BIN_NODE_DTYPE = np.dtype([
    ("parent", "<i4"), ("desc", "u1", 32), ("weight", "<f4"), ("leaf", "u1"),
])


def load_dbow2_binary(path: str) -> GeneralVocabulary:
    """Parse a DBoW2 binary vocabulary (the ORBvoc.bin format produced by
    the reference's bin_vocabulary converter; layout per
    TemplatedVocabulary::saveToBinaryFile — header of nb_nodes/size_node/
    k/L/scoring/weighting, then packed 41-byte node records
    [parent i32][32 desc bytes][weight f32][is_leaf u8])."""
    with open(path, "rb") as f:
        head = np.frombuffer(f.read(8), "<u4")
        nb_nodes, size_node = int(head[0]), int(head[1])
        k, L, _scoring, _weighting = np.frombuffer(f.read(16), "<i4")
        if size_node != _BIN_NODE_DTYPE.itemsize:
            raise ValueError(
                f"unsupported DBoW2 binary node size {size_node} "
                f"(expected {_BIN_NODE_DTYPE.itemsize} for ORB)")
        rec = np.frombuffer(f.read(nb_nodes * size_node), _BIN_NODE_DTYPE,
                            count=nb_nodes)
    return _build_general(
        rec["parent"].astype(np.int64), rec["leaf"].astype(bool),
        rec["desc"], rec["weight"].astype(np.float32), int(k), int(L))


def save_dbow2_binary(voc: GeneralVocabulary, path: str):
    """Write the DBoW2 binary format (round-trips through
    load_dbow2_binary; also loadable by the reference)."""
    nodes = np.asarray(voc.nodes).view(np.uint8).reshape(-1, 32)
    children = np.asarray(voc.children)
    word_id = np.asarray(voc.word_id)
    weights = np.asarray(voc.word_weights)
    n = nodes.shape[0]
    parent = np.zeros(n, np.int32)
    for p in range(n):
        for c in children[p]:
            if c > 0 and c != p and parent[c] == 0:
                parent[c] = p
    rec = np.zeros(n - 1, _BIN_NODE_DTYPE)
    rec["parent"] = parent[1:]
    rec["desc"] = nodes[1:]
    leaf = word_id[1:] >= 0
    rec["leaf"] = leaf
    rec["weight"][leaf] = weights[word_id[1:][leaf]]
    with open(path, "wb") as f:
        f.write(np.asarray([n - 1, _BIN_NODE_DTYPE.itemsize],
                           "<u4").tobytes())
        f.write(np.asarray([voc.k, voc.depth, 0, 0], "<i4").tobytes())
        f.write(rec.tobytes())


def load_vocabulary(path: str):
    """Load a vocabulary by extension: .npz (native), .txt (DBoW2 text),
    .bin (DBoW2 binary) — the reference's System loads .bin preferred with
    text fallback (src/System.cc:158-196)."""
    if path.endswith(".bin"):
        return load_dbow2_binary(path)
    if path.endswith(".txt"):
        return load_dbow2_text(path)
    return GeneralVocabulary.load(path) if _is_general_npz(path) \
        else Vocabulary.load(path)


def _is_general_npz(path: str) -> bool:
    try:
        with np.load(path) as z:
            return "children" in z.files
    except Exception:
        return False


def _quantize_general(voc: GeneralVocabulary, desc: jnp.ndarray) -> jnp.ndarray:
    n = desc.shape[0]
    idx = jnp.zeros((n,), jnp.int32)  # root
    for _ in range(voc.depth):
        ch = voc.children[idx]                      # [N, k]
        valid = ch >= 0
        cands = voc.nodes[jnp.maximum(ch, 0)]       # [N, k, 8]
        d = jnp.sum(
            jax.lax.population_count(jnp.bitwise_xor(desc[:, None, :], cands)),
            axis=-1,
        )
        d = jnp.where(valid, d, jnp.iinfo(jnp.int32).max)
        best = jnp.argmin(d, axis=-1)
        nxt = jnp.take_along_axis(ch, best[:, None], axis=1)[:, 0]
        idx = jnp.where(nxt >= 0, nxt, idx)
    return voc.word_id[idx]


def quantize(voc, desc: jnp.ndarray, mask=None) -> jnp.ndarray:
    """Batched tree descent: [N, 8] uint32 -> word ids [N] int32."""
    from ..features.matching import hamming

    if isinstance(voc, GeneralVocabulary):
        return _quantize_general(voc, desc)
    n = desc.shape[0]
    idx = jnp.zeros((n,), jnp.int32)  # child-path index within level
    for l in range(voc.depth):
        off = voc.level_offset[l]
        # children of current node: rows off + idx*k ... off + idx*k + k-1
        base = off + idx * voc.k
        child_rows = base[:, None] + jnp.arange(voc.k)[None, :]  # [N, k]
        cands = voc.nodes[child_rows]  # [N, k, 8]
        d = jnp.sum(
            jax.lax.population_count(jnp.bitwise_xor(desc[:, None, :], cands)),
            axis=-1,
        )
        best = jnp.argmin(d, axis=-1).astype(jnp.int32)
        idx = idx * voc.k + best
    return idx


def node_ids(voc: Vocabulary, words: jnp.ndarray, levels_up: int = 1) -> jnp.ndarray:
    """Coarser-level node id of each word (reference: FeatureVector nodes at
    levelsup, used to gate SearchByBoW)."""
    return words // (voc.k ** levels_up)


def bow_vector(voc, words: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Dense L1-normalized TF-IDF vector [n_words]. Accepts the regular
    trained Vocabulary or a loaded GeneralVocabulary."""
    v = jnp.zeros((voc.n_words,), jnp.float32)
    v = v.at[jnp.maximum(words, 0)].add(jnp.where(mask & (words >= 0), 1.0, 0.0))
    v = v * voc.word_weights
    return v / jnp.maximum(jnp.sum(v), 1e-9)


def l1_score(v1: jnp.ndarray, v2: jnp.ndarray) -> jnp.ndarray:
    """DBoW2 L1 similarity in [0, 1]: 1 - 0.5 |v1 - v2|_1 (reference:
    TemplatedVocabulary score with L1_NORM)."""
    return 1.0 - 0.5 * jnp.sum(jnp.abs(v1 - v2), axis=-1)


def score_database(query: jnp.ndarray, db: jnp.ndarray) -> jnp.ndarray:
    """Score one query BoW vector against a [K, W] database — one matvec-like
    reduction (L1 similarity)."""
    return 1.0 - 0.5 * jnp.sum(jnp.abs(db - query[None, :]), axis=-1)
