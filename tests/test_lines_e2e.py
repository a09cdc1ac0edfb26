"""End-to-end evidence that the line pipeline earns its keep.

VERDICT r1 item 2 acceptance: (a) lines constrain the tracking pose solve,
(b) local mapping triangulates new lines, (c) loop correction moves line
landmarks, (d) stereo runs create line landmarks. The reference motivates
lines exactly this way — low-texture man-made scenes where point-only
tracking drifts (reference: README.md:14, src/Optimizer.cc:2375 line edges
in PoseOptimization).
"""

import numpy as np
import pytest

from plvs_tpu.geometry import cameras
from plvs_tpu.io import evaluation, synthetic
from plvs_tpu.slam import System, SystemConfig

CAM = cameras.pinhole(300.0, 300.0, 160.0, 120.0, width=320, height=240,
                      bf=24.0)
N_FRAMES = 30


def _run(use_lines: bool, sensor: str = "rgbd", depth_noise: float = 0.0):
    tex = synthetic.make_line_texture(rng=seed_rng())
    scene = synthetic.SyntheticRGBD(CAM, wall_z=3.0, texture=tex)
    cfg = SystemConfig(num_features=512, n_levels=4, max_kf=64,
                       max_pts=16384, use_lines=use_lines, max_lines=64,
                       sensor=sensor)
    system = System(CAM, cfg)
    gt = []
    baseline = CAM.bf / float(CAM.params[0])  # meters
    for i, (ts, gray, depth, R_gt, t_gt) in enumerate(
            scene.sequence(n_frames=N_FRAMES)):
        if sensor == "stereo":
            t_r = t_gt - np.array([baseline, 0, 0], np.float32)
            gray_r, _ = scene.render(R_gt, t_r)
            system.track_stereo(gray, gray_r, ts)
        else:
            if depth_noise:
                rng = np.random.default_rng(77 + i)
                depth = depth + rng.normal(
                    0, depth_noise, depth.shape).astype(np.float32) \
                    * depth ** 2
            system.track_rgbd(gray, depth, ts)
        gt.append((R_gt, t_gt))
    traj = system.trajectory_tum()
    gt_xyz = np.stack([-R.T @ t for R, t in gt])
    ate = evaluation.ate_rmse(traj[:, 1:4], gt_xyz, align=True)
    return system, ate


def seed_rng():
    return np.random.default_rng(11)


@pytest.fixture(scope="module")
def runs():
    sys_pts, ate_pts = _run(use_lines=False)
    sys_pl, ate_pl = _run(use_lines=True)
    return sys_pts, ate_pts, sys_pl, ate_pl


@pytest.mark.slow
class TestLinesReduceATE:
    def test_line_landmarks_created(self, runs):
        _, _, sys_pl, _ = runs
        assert sys_pl.store.num_lines > 5

    def test_lines_have_multi_view_observations(self, runs):
        _, _, sys_pl, _ = runs
        st = sys_pl.store
        lns = np.nonzero(st.ln_mask)[0]
        assert (st.ln_n_obs[lns] >= 2).sum() >= 3

    def test_lines_do_not_hurt_and_help_on_low_texture(self, runs):
        _, ate_pts, _, ate_pl = runs
        # lines must not degrade the solution, and on this line-dominated
        # scene should measurably improve it
        assert ate_pl <= ate_pts * 1.05, (ate_pl, ate_pts)
        assert ate_pl < 0.05, ate_pl

    def test_lines_strictly_lower_ate_under_depth_noise(self):
        """With noisy depth the few blob corners drift; the bar landmarks'
        joint point+line solve must LOWER ATE, strictly (reference claim:
        PLVS lines improve robustness on low-texture man-made scenes,
        README.md:14 / src/LineMatcher.cc suite)."""
        _, ate_pts = _run(use_lines=False, depth_noise=0.006)
        sys_pl, ate_pl = _run(use_lines=True, depth_noise=0.006)
        assert sys_pl.store.num_lines >= 5
        assert ate_pl < ate_pts, (ate_pl, ate_pts)


@pytest.mark.slow
class TestStereoLines:
    def test_stereo_creates_line_landmarks(self):
        sys_st, ate = _run(use_lines=True, sensor="stereo")
        assert sys_st.store.num_lines > 0, "stereo run created no lines"
        assert ate < 0.10, ate


class TestLoopMovesLines:
    def test_loop_correction_transforms_lines(self):
        """After a forced pose-graph correction, line endpoints move with
        their reference keyframes (reference: CorrectLoop line update,
        src/LoopClosing.cc:1260-1584)."""
        from plvs_tpu.slam.loop_closing import LoopCloser
        from plvs_tpu.slam.map_store import MapStore

        st = MapStore(max_kf=16, max_pts=2048, n_kp=64, max_lines=64,
                      n_kl=16)
        rng = np.random.default_rng(0)
        # a straight corridor of keyframes with shared points so the
        # covisibility chain exists
        n_kf = 6
        pts_w = rng.uniform(-1, 1, (64, 3)).astype(np.float32) + [0, 0, 3]
        for i in range(n_kf):
            k = st.alloc_kf()
            st.kf_mask[k] = True
            st.kf_R[k] = np.eye(3, dtype=np.float32)
            st.kf_t[k] = np.array([-0.1 * i, 0, 0], np.float32)
            st.kf_frame_id[k] = i
            st.kf_timestamp[k] = float(i)
        ids = st.alloc_pts(64)
        st.pt_xyz[ids] = pts_w
        st.pt_mask[ids] = True
        st.pt_ref_kf[ids] = 0
        for k in range(n_kf):
            st.add_observations(k, ids, np.arange(64))
        # one line landmark referenced to the last KF
        ln = st.alloc_lines(1)
        st.ln_Xs[ln] = np.array([[0.2, 0.0, 3.0]], np.float32)
        st.ln_Xe[ln] = np.array([[0.2, 0.5, 3.0]], np.float32)
        st.ln_mask[ln] = True
        st.ln_ref_kf[ln] = n_kf - 1
        before = st.ln_Xs[ln].copy()

        lc = LoopCloser(st)
        # force-correct with a relative pose implying the last KF drifted
        R_rel = np.eye(3, dtype=np.float32)
        t_rel = np.array([0.3, 0.0, 0.0], np.float32)  # measured offset
        lc._correct(n_kf - 1, 0, R_rel, t_rel, fuse_pairs=[])
        after = st.ln_Xs[ln]
        moved = np.linalg.norm(after - before)
        assert moved > 1e-3, "line landmark did not move with the loop"
