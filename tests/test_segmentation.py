"""Incremental 3D segmentation tests: global label association, per-voxel
label confidence fusion, and the end-to-end two-plane scene."""

import numpy as np
import pytest

from plvs_tpu.dense import labels as lbl_mod
from plvs_tpu.dense.mapping import DenseMapper
from plvs_tpu.dense.tsdf import TSDFVolume
from plvs_tpu.geometry import cameras


CAM = cameras.pinhole(100.0, 100.0, 64.0, 48.0, width=128, height=96)


def _two_plane_depth():
    """Left half: wall at 2m; right half: wall at 1m (sharp depth gap)."""
    d = np.full((96, 128), 2.0, np.float32)
    d[:, 64:] = 1.0
    return d


class TestGlobalLabelMap:
    def test_new_labels_allocated(self):
        lm = lbl_mod.GlobalLabelMap(min_overlap_px=5)
        local = np.zeros((10, 10), np.int32)
        local[:5] = 1
        local[5:] = 2
        lut = lm.associate(local, np.zeros((10, 10), np.int32))
        assert lut[0] == 0
        assert sorted(lut[1:].tolist()) == [1, 2]
        assert lm.next_global == 3

    def test_overlap_reuses_global_id(self):
        lm = lbl_mod.GlobalLabelMap(min_overlap_px=5, min_overlap_frac=0.2)
        local = np.zeros((10, 10), np.int32)
        local[:5] = 1
        glob = np.zeros((10, 10), np.int32)
        glob[:5] = 7      # map already says: this region is global segment 7
        lm.next_global = 8
        lut = lm.associate(local, glob)
        assert lut[1] == 7
        assert lm.next_global == 8  # nothing new allocated

    def test_insufficient_overlap_gets_new_id(self):
        lm = lbl_mod.GlobalLabelMap(min_overlap_px=5, min_overlap_frac=0.5)
        local = np.zeros((10, 10), np.int32)
        local[:6] = 1               # 60 px
        glob = np.zeros((10, 10), np.int32)
        glob[0, :10] = 7            # only 10 px overlap < 50% of 60
        lm.next_global = 8
        lut = lm.associate(local, glob)
        assert lut[1] == 8

    def test_apply(self):
        lm = lbl_mod.GlobalLabelMap()
        local = np.array([[0, 1], [2, 1]], np.int32)
        lut = np.array([0, 10, 20], np.int32)
        np.testing.assert_array_equal(
            lm.apply(local, lut), [[0, 10], [20, 10]])

    def test_keyframes_in_radius(self):
        pos = np.array([[0, 0, 0], [1, 0, 0], [5, 0, 0]], np.float32)
        mask = np.array([True, True, True])
        ids = lbl_mod.keyframes_in_radius(pos, mask, np.zeros(3), 2.0)
        np.testing.assert_array_equal(ids, [0, 1])
        mask[1] = False
        ids = lbl_mod.keyframes_in_radius(pos, mask, np.zeros(3), 2.0)
        np.testing.assert_array_equal(ids, [0])


class TestVoxelLabelFusion:
    def _volume_with_frame(self, label_img):
        vol = TSDFVolume(CAM, voxel_size=0.05, max_blocks=2048,
                         with_labels=True)
        depth = _two_plane_depth()
        color = np.zeros((*depth.shape, 3), np.float32)
        Rcw, tcw = np.eye(3, dtype=np.float32), np.zeros(3, np.float32)
        vol.integrate(depth, color, Rcw, tcw)
        vol.integrate_labels(depth, label_img, Rcw, tcw)
        return vol, depth, Rcw, tcw

    def test_labels_stick_to_surface(self):
        lab = np.zeros((96, 128), np.int32)
        lab[:, :64] = 1
        lab[:, 64:] = 2
        vol, depth, Rcw, tcw = self._volume_with_frame(lab)
        pts, plab = vol.segmented_cloud(min_conf=1.0)
        assert len(pts) > 100
        near = plab[pts[:, 2] < 1.5]
        far = plab[pts[:, 2] >= 1.5]
        # dominant label on each wall is the one painted there
        assert (near == 2).sum() > 0.8 * (near > 0).sum() > 0
        assert (far == 1).sum() > 0.8 * (far > 0).sum() > 0

    def test_conflicting_label_flips_after_enough_votes(self):
        lab1 = np.ones((96, 128), np.int32)
        vol, depth, Rcw, tcw = self._volume_with_frame(lab1)
        vol.integrate_labels(depth, lab1, Rcw, tcw)  # conf -> 2
        lab2 = np.full((96, 128), 3, np.int32)
        for _ in range(3):  # 2 votes drain conf, 3rd flips
            vol.integrate_labels(depth, lab2, Rcw, tcw)
        _, plab = vol.segmented_cloud(min_conf=0.5)
        assert (plab == 3).sum() > 0.9 * (plab > 0).sum()

    def test_labels_at_roundtrip(self):
        lab = np.zeros((96, 128), np.int32)
        lab[:, :64] = 5
        vol, depth, Rcw, tcw = self._volume_with_frame(lab)
        # query points on the far wall (z=2, left half -> label 5)
        q = np.array([[-0.5, 0.0, 2.0], [-0.4, 0.1, 2.0]], np.float32)
        got = vol.labels_at(q)
        assert (got == 5).all()
        # unallocated space -> 0
        q2 = np.array([[50.0, 50.0, 50.0]], np.float32)
        assert vol.labels_at(q2)[0] == 0


class TestDenseMapperSegmentation:
    def test_two_wall_scene_segments_consistently(self):
        mapper = DenseMapper(CAM, voxel_size=0.05, max_blocks=4096,
                             use_segmentation=True, filter_depth=False)
        depth = _two_plane_depth()
        color = np.zeros((*depth.shape, 3), np.float32)
        Rcw = np.eye(3, dtype=np.float32)
        for i, dx in enumerate((0.0, 0.02, 0.04)):
            tcw = np.array([dx, 0.0, 0.0], np.float32)
            mapper.insert_keyframe_rgbd(i, color, depth, Rcw, tcw)
        pts, plab = mapper.segment_cloud()
        labeled = plab[plab > 0]
        assert len(labeled) > 100
        # the same physical walls must keep the same global ids across KFs
        # (association, not re-allocation): few distinct global labels
        uniq = np.unique(labeled)
        assert len(uniq) <= 4, uniq
        # and the per-KF label images agree on global ids
        l0 = mapper.labels[0]
        l2 = mapper.labels[2]
        both = (l0 > 0) & (l2 > 0)
        agree = (l0[both] == l2[both]).mean()
        assert agree > 0.9
