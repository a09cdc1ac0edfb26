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


def _popcount_np(x: np.ndarray) -> np.ndarray:
    return np.unpackbits(x.view(np.uint8), axis=-1).sum(-1)


def _hamming_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """[N,8] x [M,8] uint32 -> [N,M] int Hamming."""
    x = a[:, None, :] ^ b[None, :, :]
    return _popcount_np(x.reshape(x.shape[0], x.shape[1], -1))


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


def quantize(voc: Vocabulary, desc: jnp.ndarray, mask=None) -> jnp.ndarray:
    """Batched tree descent: [N, 8] uint32 -> word ids [N] int32."""
    from ..features.matching import hamming

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


def bow_vector(voc: Vocabulary, words: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Dense L1-normalized TF-IDF vector [n_words]."""
    v = jnp.zeros((voc.n_words,), jnp.float32)
    v = v.at[words].add(jnp.where(mask, 1.0, 0.0))
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
