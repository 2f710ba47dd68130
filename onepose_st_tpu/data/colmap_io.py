"""COLMAP model interop (cameras/images/points3D in .bin and .txt form).

Fresh implementation of COLMAP's public model formats so maps built by this
framework can be exchanged with COLMAP-based tooling (the role of reference
src/utils/colmap/read_write_model.py, which handles both formats). Only the
PINHOLE / SIMPLE_PINHOLE camera models are materialized — all the pipeline
ever uses.
"""
from __future__ import annotations

import dataclasses
import struct
from pathlib import Path

import numpy as np

CAMERA_MODELS = {
    0: ("SIMPLE_PINHOLE", 3),
    1: ("PINHOLE", 4),
}
MODEL_IDS = {name: mid for mid, (name, _) in CAMERA_MODELS.items()}


@dataclasses.dataclass
class ColmapCamera:
    camera_id: int
    model: str
    width: int
    height: int
    params: np.ndarray  # SIMPLE_PINHOLE: [f, cx, cy]; PINHOLE: [fx, fy, cx, cy]

    @property
    def K(self) -> np.ndarray:
        if self.model == "SIMPLE_PINHOLE":
            f, cx, cy = self.params
            return np.array([[f, 0, cx], [0, f, cy], [0, 0, 1]])
        fx, fy, cx, cy = self.params
        return np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]])


@dataclasses.dataclass
class ColmapImage:
    image_id: int
    qvec: np.ndarray       # [4] (w, x, y, z), world->cam
    tvec: np.ndarray       # [3]
    camera_id: int
    name: str
    xys: np.ndarray        # [N, 2]
    point3D_ids: np.ndarray  # [N] int64, -1 if unmatched


@dataclasses.dataclass
class ColmapPoint3D:
    point3D_id: int
    xyz: np.ndarray
    rgb: np.ndarray
    error: float
    image_ids: np.ndarray
    point2D_idxs: np.ndarray


def _read(f, fmt):
    size = struct.calcsize(fmt)
    return struct.unpack(fmt, f.read(size))


def read_cameras_bin(path) -> dict[int, ColmapCamera]:
    out = {}
    with open(path, "rb") as f:
        (n,) = _read(f, "<Q")
        for _ in range(n):
            cam_id, model_id, w, h = _read(f, "<iiQQ")
            name, n_params = CAMERA_MODELS[model_id]
            params = np.asarray(_read(f, f"<{n_params}d"))
            out[cam_id] = ColmapCamera(cam_id, name, w, h, params)
    return out


def write_cameras_bin(path, cameras: dict[int, ColmapCamera]):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(cameras)))
        for cam in cameras.values():
            mid = MODEL_IDS[cam.model]
            f.write(
                struct.pack("<iiQQ", cam.camera_id, mid, cam.width, cam.height)
            )
            f.write(struct.pack(f"<{len(cam.params)}d", *cam.params))


def read_images_bin(path) -> dict[int, ColmapImage]:
    out = {}
    with open(path, "rb") as f:
        (n,) = _read(f, "<Q")
        for _ in range(n):
            (img_id,) = _read(f, "<i")
            qvec = np.asarray(_read(f, "<4d"))
            tvec = np.asarray(_read(f, "<3d"))
            (cam_id,) = _read(f, "<i")
            name = b""
            while True:
                c = f.read(1)
                if c == b"\x00":
                    break
                name += c
            (n_pts,) = _read(f, "<Q")
            data = np.frombuffer(
                f.read(24 * n_pts), dtype=[("xy", "<2f8"), ("id", "<i8")]
            )
            out[img_id] = ColmapImage(
                img_id, qvec, tvec, cam_id, name.decode(),
                data["xy"].reshape(-1, 2).copy(),
                data["id"].copy(),
            )
    return out


def write_images_bin(path, images: dict[int, ColmapImage]):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(images)))
        for im in images.values():
            f.write(struct.pack("<i", im.image_id))
            f.write(struct.pack("<4d", *im.qvec))
            f.write(struct.pack("<3d", *im.tvec))
            f.write(struct.pack("<i", im.camera_id))
            f.write(im.name.encode() + b"\x00")
            f.write(struct.pack("<Q", len(im.xys)))
            rec = np.empty(len(im.xys), dtype=[("xy", "<2f8"), ("id", "<i8")])
            rec["xy"] = im.xys
            rec["id"] = im.point3D_ids
            f.write(rec.tobytes())


def read_points3d_bin(path) -> dict[int, ColmapPoint3D]:
    out = {}
    with open(path, "rb") as f:
        (n,) = _read(f, "<Q")
        for _ in range(n):
            (pid,) = _read(f, "<Q")
            xyz = np.asarray(_read(f, "<3d"))
            rgb = np.asarray(_read(f, "<3B"), np.uint8)
            (err,) = _read(f, "<d")
            (track_len,) = _read(f, "<Q")
            track = np.frombuffer(
                f.read(8 * track_len), dtype=[("img", "<i4"), ("p2d", "<i4")]
            )
            out[pid] = ColmapPoint3D(
                pid, xyz, rgb, err, track["img"].copy(), track["p2d"].copy()
            )
    return out


def write_points3d_bin(path, points: dict[int, ColmapPoint3D]):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(points)))
        for p in points.values():
            f.write(struct.pack("<Q", p.point3D_id))
            f.write(struct.pack("<3d", *p.xyz))
            f.write(struct.pack("<3B", *p.rgb.astype(np.uint8)))
            f.write(struct.pack("<d", p.error))
            f.write(struct.pack("<Q", len(p.image_ids)))
            rec = np.empty(len(p.image_ids), dtype=[("img", "<i4"), ("p2d", "<i4")])
            rec["img"] = p.image_ids
            rec["p2d"] = p.point2D_idxs
            f.write(rec.tobytes())


def read_cameras_txt(path) -> dict[int, ColmapCamera]:
    out = {}
    for line in Path(path).read_text().splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        toks = line.split()
        cam_id, model = int(toks[0]), toks[1]
        out[cam_id] = ColmapCamera(
            cam_id, model, int(toks[2]), int(toks[3]),
            np.asarray([float(t) for t in toks[4:]]),
        )
    return out


def write_cameras_txt(path, cameras: dict[int, ColmapCamera]):
    with open(path, "w") as f:
        f.write("# Camera list with one line of data per camera:\n")
        f.write("#   CAMERA_ID, MODEL, WIDTH, HEIGHT, PARAMS[]\n")
        for cam in cameras.values():
            params = " ".join(repr(float(p)) for p in cam.params)
            f.write(
                f"{cam.camera_id} {cam.model} {cam.width} {cam.height} {params}\n"
            )


def read_images_txt(path) -> dict[int, ColmapImage]:
    out = {}
    # keep blank lines: an image with zero 2D points has an empty body line
    lines = [
        l.strip()
        for l in Path(path).read_text().splitlines()
        if not l.strip().startswith("#")
    ]
    for head, body in zip(lines[0::2], lines[1::2]):
        if not head:
            continue
        toks = head.split()
        img_id = int(toks[0])
        qvec = np.asarray([float(t) for t in toks[1:5]])
        tvec = np.asarray([float(t) for t in toks[5:8]])
        cam_id = int(toks[8])
        name = toks[9]
        b = body.split()
        xys = np.asarray(
            [[float(b[i]), float(b[i + 1])] for i in range(0, len(b), 3)]
        ).reshape(-1, 2)
        ids = np.asarray([int(b[i + 2]) for i in range(0, len(b), 3)], np.int64)
        out[img_id] = ColmapImage(img_id, qvec, tvec, cam_id, name, xys, ids)
    return out


def write_images_txt(path, images: dict[int, ColmapImage]):
    with open(path, "w") as f:
        f.write("# Image list with two lines of data per image:\n")
        f.write("#   IMAGE_ID, QW, QX, QY, QZ, TX, TY, TZ, CAMERA_ID, NAME\n")
        f.write("#   POINTS2D[] as (X, Y, POINT3D_ID)\n")
        for im in images.values():
            q = " ".join(repr(float(v)) for v in im.qvec)
            t = " ".join(repr(float(v)) for v in im.tvec)
            f.write(f"{im.image_id} {q} {t} {im.camera_id} {im.name}\n")
            f.write(
                " ".join(
                    f"{repr(float(xy[0]))} {repr(float(xy[1]))} {int(pid)}"
                    for xy, pid in zip(im.xys, im.point3D_ids)
                )
                + "\n"
            )


def read_points3d_txt(path) -> dict[int, ColmapPoint3D]:
    out = {}
    for line in Path(path).read_text().splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        toks = line.split()
        pid = int(toks[0])
        xyz = np.asarray([float(t) for t in toks[1:4]])
        rgb = np.asarray([int(t) for t in toks[4:7]], np.uint8)
        err = float(toks[7])
        track = toks[8:]
        out[pid] = ColmapPoint3D(
            pid, xyz, rgb, err,
            np.asarray([int(t) for t in track[0::2]], np.int32),
            np.asarray([int(t) for t in track[1::2]], np.int32),
        )
    return out


def write_points3d_txt(path, points: dict[int, ColmapPoint3D]):
    with open(path, "w") as f:
        f.write("# 3D point list with one line of data per point:\n")
        f.write(
            "#   POINT3D_ID, X, Y, Z, R, G, B, ERROR, "
            "TRACK[] as (IMAGE_ID, POINT2D_IDX)\n"
        )
        for p in points.values():
            xyz = " ".join(repr(float(v)) for v in p.xyz)
            rgb = " ".join(str(int(v)) for v in p.rgb)
            track = " ".join(
                f"{int(i)} {int(j)}"
                for i, j in zip(p.image_ids, p.point2D_idxs)
            )
            f.write(f"{p.point3D_id} {xyz} {rgb} {repr(float(p.error))} {track}\n")


def write_model(path, cameras, images, points, ext: str = ".bin"):
    """Write a COLMAP model in binary or text format (the reference writes
    both, coarse_colmap_dataset.py:312 / read_write_model.py)."""
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    if ext == ".bin":
        write_cameras_bin(path / "cameras.bin", cameras)
        write_images_bin(path / "images.bin", images)
        write_points3d_bin(path / "points3D.bin", points)
    elif ext == ".txt":
        write_cameras_txt(path / "cameras.txt", cameras)
        write_images_txt(path / "images.txt", images)
        write_points3d_txt(path / "points3D.txt", points)
    else:
        raise ValueError(f"unknown model format {ext!r}")


def read_model(path, ext: str | None = None):
    """Read a COLMAP model; autodetects .bin/.txt when ext is None."""
    path = Path(path)
    if ext is None:
        ext = ".bin" if (path / "cameras.bin").exists() else ".txt"
    if ext == ".bin":
        return (
            read_cameras_bin(path / "cameras.bin"),
            read_images_bin(path / "images.bin"),
            read_points3d_bin(path / "points3D.bin"),
        )
    if ext == ".txt":
        return (
            read_cameras_txt(path / "cameras.txt"),
            read_images_txt(path / "images.txt"),
            read_points3d_txt(path / "points3D.txt"),
        )
    raise ValueError(f"unknown model format {ext!r}")


def export_map(path, poses6: np.ndarray, Ks: np.ndarray, image_hw, sfm_map):
    """Write an SfMMap + scan poses as a COLMAP model (PINHOLE cameras).

    Mirrors the reference's generate_empty + triangulated-model outputs so
    downstream COLMAP tools (model_analyzer, converters) can consume ours.
    """
    from scipy.spatial.transform import Rotation

    H, W = image_hw
    cameras, images = {}, {}
    for i in range(len(poses6)):
        K = Ks[i]
        cameras[i + 1] = ColmapCamera(
            i + 1, "PINHOLE", W, H,
            np.array([K[0, 0], K[1, 1], K[0, 2], K[1, 2]], np.float64),
        )
        R = Rotation.from_rotvec(poses6[i, :3]).as_matrix()
        q = Rotation.from_matrix(R).as_quat()  # x, y, z, w
        qvec = np.array([q[3], q[0], q[1], q[2]])
        images[i + 1] = ColmapImage(
            i + 1, qvec, poses6[i, 3:].astype(np.float64), i + 1,
            f"{i}.png", np.zeros((0, 2)), np.zeros(0, np.int64),
        )
    points = {
        j + 1: ColmapPoint3D(
            j + 1, sfm_map.keypoints3d[j].astype(np.float64),
            np.array([128, 128, 128], np.uint8), 0.0,
            np.zeros(0, np.int32), np.zeros(0, np.int32),
        )
        for j in range(len(sfm_map.keypoints3d))
    }
    write_model(path, cameras, images, points)
