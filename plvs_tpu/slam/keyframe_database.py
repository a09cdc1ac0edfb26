"""Keyframe database: BoW vectors per keyframe + place-recognition queries.

TPU-native replacement for the reference's KeyFrameDatabase
(reference: src/KeyFrameDatabase.cc — inverted file mvInvertedFile
include/KeyFrameDatabase.h:106 with DetectNBestCandidates :91 for
loop/merge and DetectRelocalizationCandidates :94). The inverted index is
replaced by dense [K, W] BoW vectors scored with one batched L1 reduction;
the vocabulary is trained lazily from the first keyframes' descriptors
(see plvs_tpu.vocab.bow).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..vocab import bow
from .map_store import MapStore


@dataclasses.dataclass
class KeyFrameDatabase:
    store: MapStore
    voc: bow.Vocabulary | None = None
    vocab_train_descs: int = 4096
    min_train_descs: int = 1024

    def __post_init__(self):
        self.kf_bow: np.ndarray | None = None

    # ------------------------------------------------------------------
    def ensure_vocab(self) -> bool:
        if self.voc is not None:
            return True
        st = self.store
        live = np.nonzero(st.kf_mask)[0]
        if len(live) == 0:
            return False
        descs = st.kf_kp_desc[live][st.kf_kp_mask[live]]
        if len(descs) < self.min_train_descs:
            return False
        sel = np.random.default_rng(0).choice(
            len(descs), min(self.vocab_train_descs, len(descs)), replace=False
        )
        self.voc = bow.train(descs[sel], k=8, depth=3, seed=0)
        return True

    def bow_of_desc(self, desc: np.ndarray, mask: np.ndarray) -> np.ndarray:
        words = bow.quantize(self.voc, jnp.asarray(desc))
        return np.asarray(bow.bow_vector(self.voc, words, jnp.asarray(mask)))

    # ------------------------------------------------------------------
    def add(self, kf_id: int) -> bool:
        """Compute and store the BoW vector of a keyframe."""
        if not self.ensure_vocab():
            return False
        st = self.store
        if self.kf_bow is None:
            self.kf_bow = np.zeros((st.max_kf, self.voc.n_words), np.float32)
            for k in np.nonzero(st.kf_mask)[0]:
                if k != kf_id:
                    self.kf_bow[k] = self.bow_of_desc(
                        st.kf_kp_desc[k], st.kf_kp_mask[k])
        self.kf_bow[kf_id] = self.bow_of_desc(
            st.kf_kp_desc[kf_id], st.kf_kp_mask[kf_id])
        return True

    def rebuild(self):
        """Recompute BoW vectors for every live keyframe (used after an
        atlas load, where only descriptors are persisted — reference:
        System::LoadAtlas recomputes BoW in KeyFrame::PostLoad)."""
        if not self.ensure_vocab():
            return False
        st = self.store
        self.kf_bow = np.zeros((st.max_kf, self.voc.n_words), np.float32)
        for k in np.nonzero(st.kf_mask)[0]:
            self.kf_bow[k] = self.bow_of_desc(
                st.kf_kp_desc[k], st.kf_kp_mask[k])
        return True

    # ------------------------------------------------------------------
    def query(self, vec: np.ndarray, exclude: set[int] = frozenset(),
              top_n: int = 5, min_score: float = 0.015):
        """Score against all live keyframes; return [(kf_id, score)] desc."""
        if self.kf_bow is None:
            return []
        st = self.store
        live = np.nonzero(st.kf_mask)[0]
        if len(live) == 0:
            return []
        scores = 1.0 - 0.5 * np.abs(self.kf_bow[live] - vec[None]).sum(-1)
        out = [
            (int(k), float(s)) for k, s in zip(live, scores)
            if k not in exclude and s > min_score
        ]
        out.sort(key=lambda x: -x[1])
        return out[:top_n]

    def relocalization_candidates(self, desc: np.ndarray, mask: np.ndarray,
                                  top_n: int = 5):
        """Candidates for a lost frame (reference:
        DetectRelocalizationCandidates)."""
        if not self.ensure_vocab() or self.kf_bow is None:
            return []
        vec = self.bow_of_desc(desc, mask)
        return self.query(vec, top_n=top_n)
