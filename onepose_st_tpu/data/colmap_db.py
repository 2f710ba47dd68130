"""COLMAP SQLite database interop.

Fresh implementation of COLMAP's public database schema (the role of
reference src/utils/colmap/database.py + the feature/match import path in
src/sfm_utils/triangulation.py:48-170), so maps and matches produced by
this framework can be handed to external COLMAP tooling — and COLMAP
databases can be read back. The framework itself never shells out to
COLMAP (triangulation/BA are in-framework, sfm/); this module exists purely
for ecosystem compatibility.
"""
from __future__ import annotations

import sqlite3
from pathlib import Path

import numpy as np

MAX_IMAGE_ID = 2**31 - 1

_SCHEMA = f"""
CREATE TABLE IF NOT EXISTS cameras (
    camera_id INTEGER PRIMARY KEY AUTOINCREMENT NOT NULL,
    model INTEGER NOT NULL,
    width INTEGER NOT NULL,
    height INTEGER NOT NULL,
    params BLOB,
    prior_focal_length INTEGER NOT NULL);
CREATE TABLE IF NOT EXISTS images (
    image_id INTEGER PRIMARY KEY AUTOINCREMENT NOT NULL,
    name TEXT NOT NULL UNIQUE,
    camera_id INTEGER NOT NULL,
    prior_qw REAL, prior_qx REAL, prior_qy REAL, prior_qz REAL,
    prior_tx REAL, prior_ty REAL, prior_tz REAL,
    CONSTRAINT image_id_check CHECK(image_id >= 0 and image_id < {MAX_IMAGE_ID}),
    FOREIGN KEY(camera_id) REFERENCES cameras(camera_id));
CREATE TABLE IF NOT EXISTS keypoints (
    image_id INTEGER PRIMARY KEY NOT NULL,
    rows INTEGER NOT NULL, cols INTEGER NOT NULL, data BLOB,
    FOREIGN KEY(image_id) REFERENCES images(image_id) ON DELETE CASCADE);
CREATE TABLE IF NOT EXISTS descriptors (
    image_id INTEGER PRIMARY KEY NOT NULL,
    rows INTEGER NOT NULL, cols INTEGER NOT NULL, data BLOB,
    FOREIGN KEY(image_id) REFERENCES images(image_id) ON DELETE CASCADE);
CREATE TABLE IF NOT EXISTS matches (
    pair_id INTEGER PRIMARY KEY NOT NULL,
    rows INTEGER NOT NULL, cols INTEGER NOT NULL, data BLOB);
CREATE TABLE IF NOT EXISTS two_view_geometries (
    pair_id INTEGER PRIMARY KEY NOT NULL,
    rows INTEGER NOT NULL, cols INTEGER NOT NULL, data BLOB,
    config INTEGER NOT NULL,
    F BLOB, E BLOB, H BLOB, qvec BLOB, tvec BLOB);
CREATE UNIQUE INDEX IF NOT EXISTS index_name ON images(name);
"""

CAMERA_MODEL_IDS = {"SIMPLE_PINHOLE": 0, "PINHOLE": 1}


def image_ids_to_pair_id(image_id1: int, image_id2: int) -> int:
    if image_id1 > image_id2:
        image_id1, image_id2 = image_id2, image_id1
    return image_id1 * MAX_IMAGE_ID + image_id2


def pair_id_to_image_ids(pair_id: int) -> tuple[int, int]:
    image_id2 = pair_id % MAX_IMAGE_ID
    return (pair_id - image_id2) // MAX_IMAGE_ID, image_id2


def _blob(a: np.ndarray, dtype) -> bytes:
    return np.ascontiguousarray(a, dtype).tobytes()


class ColmapDatabase:
    """Thin sqlite3 wrapper over the COLMAP schema."""

    def __init__(self, path: str | Path):
        self.conn = sqlite3.connect(str(path))
        self.conn.executescript(_SCHEMA)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def close(self):
        self.conn.commit()
        self.conn.close()

    # ---- writes -----------------------------------------------------------
    def add_camera(
        self, model: str | int, width: int, height: int, params,
        prior_focal_length: bool = False, camera_id: int | None = None,
    ) -> int:
        model_id = CAMERA_MODEL_IDS[model] if isinstance(model, str) else model
        cur = self.conn.execute(
            "INSERT INTO cameras VALUES (?, ?, ?, ?, ?, ?)",
            (camera_id, model_id, width, height,
             _blob(np.asarray(params), np.float64), int(prior_focal_length)),
        )
        return cur.lastrowid

    def add_image(
        self, name: str, camera_id: int,
        prior_q=(None,) * 4, prior_t=(None,) * 3, image_id: int | None = None,
    ) -> int:
        cur = self.conn.execute(
            "INSERT INTO images VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?, ?)",
            (image_id, name, camera_id, *prior_q, *prior_t),
        )
        return cur.lastrowid

    def add_keypoints(self, image_id: int, keypoints: np.ndarray):
        """[N, 2|4|6] float32 (COLMAP convention: +0.5px origin shift is the
        caller's choice; reference triangulation.py:98 adds 0.5)."""
        kp = np.asarray(keypoints, np.float32)
        self.conn.execute(
            "INSERT INTO keypoints VALUES (?, ?, ?, ?)",
            (image_id, kp.shape[0], kp.shape[1], _blob(kp, np.float32)),
        )

    def add_descriptors(self, image_id: int, descriptors: np.ndarray):
        d = np.asarray(descriptors, np.uint8)
        self.conn.execute(
            "INSERT INTO descriptors VALUES (?, ?, ?, ?)",
            (image_id, d.shape[0], d.shape[1], _blob(d, np.uint8)),
        )

    def add_matches(self, image_id1: int, image_id2: int, matches: np.ndarray):
        m = np.asarray(matches, np.uint32)
        if image_id1 > image_id2:
            m = m[:, ::-1]
        self.conn.execute(
            "INSERT INTO matches VALUES (?, ?, ?, ?)",
            (image_ids_to_pair_id(image_id1, image_id2),
             m.shape[0], m.shape[1], _blob(m, np.uint32)),
        )

    def add_two_view_geometry(
        self, image_id1: int, image_id2: int, matches: np.ndarray,
        F=None, E=None, H=None, config: int = 2,
    ):
        m = np.asarray(matches, np.uint32)
        if image_id1 > image_id2:
            m = m[:, ::-1]
        eye = np.eye(3)
        self.conn.execute(
            "INSERT INTO two_view_geometries VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?, ?)",
            (image_ids_to_pair_id(image_id1, image_id2),
             m.shape[0], m.shape[1], _blob(m, np.uint32), config,
             _blob(F if F is not None else eye, np.float64),
             _blob(E if E is not None else eye, np.float64),
             _blob(H if H is not None else eye, np.float64),
             _blob(np.array([1.0, 0, 0, 0]), np.float64),
             _blob(np.zeros(3), np.float64)),
        )

    # ---- reads ------------------------------------------------------------
    def read_keypoints(self, image_id: int) -> np.ndarray:
        rows, cols, data = self.conn.execute(
            "SELECT rows, cols, data FROM keypoints WHERE image_id=?",
            (image_id,),
        ).fetchone()
        return np.frombuffer(data, np.float32).reshape(rows, cols)

    def read_matches(self, image_id1: int, image_id2: int) -> np.ndarray:
        row = self.conn.execute(
            "SELECT rows, cols, data FROM matches WHERE pair_id=?",
            (image_ids_to_pair_id(image_id1, image_id2),),
        ).fetchone()
        if row is None:
            return np.zeros((0, 2), np.uint32)
        rows, cols, data = row
        m = np.frombuffer(data, np.uint32).reshape(rows, cols)
        return m[:, ::-1] if image_id1 > image_id2 else m

    def read_images(self) -> dict[int, tuple[str, int]]:
        return {
            i: (name, cam)
            for i, name, cam in self.conn.execute(
                "SELECT image_id, name, camera_id FROM images"
            )
        }


def export_matches_db(
    path: str | Path,
    Ks: np.ndarray,          # [F, 3, 3]
    image_hw: tuple[int, int],
    keypoints: list[np.ndarray],
    matches: dict[tuple[int, int], np.ndarray],
    image_names: list[str] | None = None,
):
    """Write a full COLMAP DB from framework keypoints/matches (the role of
    triangulation.py:48-170's create_db/import_features/import_matches)."""
    H, W = image_hw
    with ColmapDatabase(path) as db:
        for f in range(len(Ks)):
            K = Ks[f]
            cam = db.add_camera(
                "PINHOLE", W, H, [K[0, 0], K[1, 1], K[0, 2], K[1, 2]]
            )
            name = image_names[f] if image_names else f"{f}.png"
            img_id = db.add_image(name, cam)
            # COLMAP keypoint origin is the corner, ours the pixel center
            db.add_keypoints(img_id, keypoints[f] + 0.5)
        for (i, j), m in matches.items():
            db.add_matches(i + 1, j + 1, m)
            db.add_two_view_geometry(i + 1, j + 1, m)
