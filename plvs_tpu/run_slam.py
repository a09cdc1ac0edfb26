"""CLI entry point: run SLAM on a dataset or the synthetic benchmark.

TPU-native equivalent of the reference's example mains
(reference: Examples/RGB-D/rgbd_tum.cc main — load dataset, loop
SLAM.TrackRGBD, save trajectory; Scripts/run_tum_rgbd.sh launchers).

Usage:
  python -m plvs_tpu.run_slam --synthetic [--frames 60] [--out traj.txt]
  python -m plvs_tpu.run_slam --tum /path/to/rgbd_dataset --settings cfg.yaml
  python -m plvs_tpu.run_slam --euroc /path/to/MH_01 --settings cfg.yaml
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description="plvs_tpu SLAM runner")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--tum", type=str, default=None,
                    help="TUM RGB-D sequence dir; ICL-NUIM's TUM-compatible "
                         "download uses the same layout (reference: "
                         "Scripts/evaluate_icl_nuim.sh + ICL.yaml preset)")
    ap.add_argument("--euroc", type=str, default=None,
                    help="EuRoC mav0 dir (stereo; reference: "
                         "Examples/Stereo/stereo_euroc.cc). TUM-VI uses the "
                         "same mav0 layout — pass a TUM-VI sequence here "
                         "with Settings/TUM-VI.yaml")
    ap.add_argument("--kitti", type=str, default=None,
                    help="KITTI sequence dir (stereo; reference: "
                         "Examples/Stereo/stereo_kitti.cc)")
    ap.add_argument("--inertial", action="store_true",
                    help="feed the dataset's IMU stream (EuRoC path; needs "
                         "IMU.* keys in --settings)")
    ap.add_argument("--mono", action="store_true",
                    help="monocular mode: use only the left/rgb image")
    ap.add_argument("--localization", action="store_true",
                    help="localization-only mode (frozen map)")
    ap.add_argument("--settings", type=str, default=None)
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--out", type=str, default="trajectory_tum.txt")
    ap.add_argument("--out-format", choices=["tum", "kitti", "euroc"],
                    default="tum")
    ap.add_argument("--save-map", type=str, default=None)
    ap.add_argument("--save-dense", type=str, default=None)
    ap.add_argument("--viz", type=str, default=None, metavar="MAP_PNG",
                    help="render the final map to a PNG (headless viewer)")
    ap.add_argument("--dense", action="store_true")
    ap.add_argument("--lines", action="store_true")
    ap.add_argument("--async-mapping", action="store_true",
                    help="run local mapping/loop closing/dense on the "
                         "mapper actor thread (realtime mode)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend")
    ap.add_argument("--timing", action="store_true")
    ap.add_argument("--live-viewer", type=int, default=None, metavar="PORT",
                    help="serve an interactive live map view on this HTTP "
                         "port (0 = auto; pause/resume/save from browser)")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from plvs_tpu.geometry import cameras
    from plvs_tpu.io import evaluation, synthetic, trajectory
    from plvs_tpu.slam import System, SystemConfig
    from plvs_tpu.utils.profiling import Stopwatch

    sw = Stopwatch()

    if args.settings:
        from plvs_tpu.slam.settings import Settings

        st = Settings.from_yaml(args.settings)
        cam, cfg = st.camera, st.config
    else:
        cam = cameras.pinhole(300.0, 300.0, 160.0, 120.0, width=320,
                              height=240, bf=24.0)
        cfg = SystemConfig(num_features=512, n_levels=4)
    if args.dense:
        cfg.dense_mapping = True
    if args.lines:
        cfg.use_lines = True
    if args.async_mapping:
        cfg.async_mapping = True
    if args.mono:
        cfg.sensor = "mono"
    elif args.euroc or args.kitti:
        cfg.sensor = "stereo"
    if args.inertial:
        cfg.use_imu = True

    system = System(cam, cfg,
                    cam2=(st.camera2 if args.settings else None),
                    T_c1_c2=(st.T_c1_c2 if args.settings else None),
                    imu_calib=(st.imu if args.settings else None),
                    imu_T_b_c=(st.imu_T_b_c if args.settings else None))
    if args.settings:
        # SparseMapping.reuseMap: start from the saved atlas (reference:
        # System::LoadAtlas flow, src/System.cc:201-229)
        import os as _os

        if st.reuse_map and st.map_filename and _os.path.exists(
                st.map_filename):
            system.load_map(st.map_filename, freeze=st.freeze_map,
                            force_relocalization=st.force_relocalization)
            print(f"reusing sparse map {st.map_filename}")
    if args.localization:
        system.activate_localization_mode()

    viewer = None
    if args.live_viewer is not None:
        from .viz.live_server import LiveViewer

        viewer = LiveViewer(system, port=args.live_viewer)
        print(f"live viewer: http://127.0.0.1:{viewer.port}/")
        _orig_track = system.track_rgbd

        def _gated(*a, **kw):
            viewer.wait_if_paused()
            return _orig_track(*a, **kw)

        system.track_rgbd = _gated

    if args.synthetic:
        scene = synthetic.SyntheticRGBD(cam, wall_z=3.0, seed=0)
        gt = []
        n = 0
        t0 = time.perf_counter()
        for ts, gray, depth, R_gt, t_gt in scene.sequence(n_frames=args.frames):
            with sw.scope("track"):
                system.track_rgbd(gray, depth, ts)
            gt.append(-R_gt.T @ t_gt)
            n += 1
        dt = time.perf_counter() - t0
        traj = system.trajectory_tum()
        rmse = evaluation.ate_rmse(traj[:, 1:4], np.stack(gt), align=True)
        print(json.dumps({
            "frames": n, "fps": round(n / dt, 2),
            "ate_rmse": round(float(rmse), 5),
            **system.map_statistics(),
        }))
    elif args.tum:
        from plvs_tpu.io.datasets import TumRGBD

        ds = TumRGBD(args.tum)
        n = 0
        t0 = time.perf_counter()
        for ts, gray, depth in ds.frames():
            with sw.scope("track"):
                if args.mono:
                    system.track_monocular(gray, ts)
                else:
                    system.track_rgbd(gray, depth, ts)
            n += 1
        dt = time.perf_counter() - t0
        print(json.dumps({"frames": n, "fps": round(n / dt, 2),
                          **system.map_statistics()}))
    elif args.euroc or args.kitti:
        if args.euroc:
            from plvs_tpu.io.datasets import EurocStereo

            ds = EurocStereo(args.euroc)
        else:
            from plvs_tpu.io.datasets import KittiStereo

            ds = KittiStereo(args.kitti)
        imu_rows = None
        imu_pos = 0
        if args.inertial:
            if not hasattr(ds, "imu"):
                ap.error("--inertial requires an IMU stream (EuRoC layout)")
            imu_rows = ds.imu()
        n = 0
        t0 = time.perf_counter()
        for ts, left, right in ds.frames():
            samples = None
            if imu_rows is not None:
                # samples in (prev frame, this frame] (reference:
                # Stereo-Inertial mains collect vImuMeas between images)
                end = imu_pos
                while end < len(imu_rows) and imu_rows[end, 0] <= ts:
                    end += 1
                samples = [(r[0], r[1:4], r[4:7])
                           for r in imu_rows[imu_pos:end]]
                imu_pos = end
            with sw.scope("track"):
                if args.mono:
                    system.track_monocular(left, ts)
                else:
                    system.track_stereo(left, right, ts,
                                        imu_samples=samples)
            n += 1
        dt = time.perf_counter() - t0
        print(json.dumps({"frames": n, "fps": round(n / dt, 2),
                          **system.map_statistics()}))
    else:
        ap.error("choose --synthetic, --tum, --euroc or --kitti")

    writer = {"tum": trajectory.write_tum, "kitti": trajectory.write_kitti,
              "euroc": trajectory.write_euroc}[args.out_format]
    writer(args.out, system.trajectory)
    print(f"trajectory written to {args.out}")

    save_map_path = args.save_map
    if not save_map_path and args.settings and st.save_map and st.map_filename:
        # SparseMapping.saveMap: persist on shutdown (reference:
        # src/System.cc:829-844)
        save_map_path = st.map_filename
    if save_map_path:
        from plvs_tpu.io import serialization

        voc = system.kfdb.voc if system.kfdb else None
        serialization.save_atlas(save_map_path, system.store, voc)
        print(f"map saved to {save_map_path}")
    if args.save_dense and system.dense_mapper is not None:
        from plvs_tpu.io import serialization

        serialization.save_dense(args.save_dense, system.dense_mapper.volume)
        print(f"dense map saved to {args.save_dense}")
    if args.viz:
        from plvs_tpu.viz import map_drawer

        traj_np = system.trajectory_tum()
        dense = None
        if system.dense_mapper is not None:
            dense = system.dense_mapper.cloud()[0]
        if args.settings:
            # static PLY overlays declared in the settings file (reference:
            # GlObjects.* block, drawn by the viewer src/Viewer.cc:813)
            from plvs_tpu.viz.gl_objects import GlObjectList

            gl = GlObjectList()
            if gl.load(args.settings):
                overlay = gl.all_world_points()[0]
                dense = (overlay if dense is None
                         else np.concatenate([dense, overlay], 0))
        if map_drawer.render_map_png(args.viz, system.store,
                                     dense_cloud=dense,
                                     traj=traj_np[:, 1:4]):
            print(f"map rendered to {args.viz}")
    if args.timing:
        print(sw.report())


if __name__ == "__main__":
    main()
