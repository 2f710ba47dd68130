"""3D scene dumps for debugging SfM maps and pose tracks.

Host-side analogue of the reference's wis3d usage
(src/KeypointFreeSfM/post_optimization/utils/vis3d.py and
coarse_colmap_dataset.py:444-462): per-stage dumps of point clouds, camera
frusta and 3D boxes that can be inspected after a run. Instead of the wis3d
web service this writes

  <dir>/<name>.ply          one PLY per point cloud (colors preserved)
  <dir>/scene.json          all entities (points subsampled, line sets full)
  <dir>/viewer.html         a self-contained, dependency-free orbit viewer
                            (plain <canvas>, no network access needed)

so a dump is a directory you can open in any browser or feed to any PLY
tool. All inputs are NumPy on host; nothing here touches JAX.
"""
from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from ..data.ply_io import save_ply

_PALETTE = [
    (66, 133, 244), (219, 68, 55), (244, 180, 0), (15, 157, 88),
    (171, 71, 188), (0, 172, 193), (255, 112, 67), (158, 157, 36),
]

# camera frustum wireframe in camera coordinates, before K/extrinsics:
# apex at the optical center plus a rectangle at unit depth.
_FRUSTUM_EDGES = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (2, 3), (3, 4), (4, 1)]

_BOX_EDGES = [
    (0, 1), (1, 2), (2, 3), (3, 0),
    (4, 5), (5, 6), (6, 7), (7, 4),
    (0, 4), (1, 5), (2, 6), (3, 7),
]


class SceneDump:
    """Accumulate named 3D entities, then `save(dir)`.

    >>> dump = SceneDump()
    >>> dump.add_points("map", xyz, colors)
    >>> dump.add_camera("frame_0", T44, K, (512, 512))
    >>> dump.add_box("gt_box", corners8x3)
    >>> dump.save("runs/e2e/scene")
    """

    def __init__(self, max_viewer_points: int = 20000):
        self._points: list[dict] = []
        self._lines: list[dict] = []
        self.max_viewer_points = int(max_viewer_points)

    # -- entities ----------------------------------------------------------
    def add_points(
        self,
        name: str,
        xyz: np.ndarray,
        colors: np.ndarray | None = None,
    ) -> None:
        """[N, 3] float points; colors [N, 3] uint8 or a single RGB."""
        xyz = np.asarray(xyz, np.float32).reshape(-1, 3)
        if colors is None:
            colors = np.array(_PALETTE[len(self._points) % len(_PALETTE)])
        colors = np.asarray(colors, np.uint8)
        if colors.ndim == 1:
            colors = np.broadcast_to(colors, xyz.shape).copy()
        self._points.append({"name": name, "xyz": xyz, "rgb": colors})

    def add_lines(
        self,
        name: str,
        segments: np.ndarray,
        color: tuple[int, int, int] | None = None,
    ) -> None:
        """[M, 2, 3] line segments in world coordinates."""
        segments = np.asarray(segments, np.float32).reshape(-1, 2, 3)
        if color is None:
            color = _PALETTE[len(self._lines) % len(_PALETTE)]
        self._lines.append(
            {"name": name, "seg": segments, "rgb": [int(c) for c in color]}
        )

    def add_camera(
        self,
        name: str,
        T44: np.ndarray,
        K: np.ndarray,
        image_hw: tuple[int, int],
        scale: float = 0.05,
        color: tuple[int, int, int] | None = None,
    ) -> None:
        """Camera frustum from a world->camera 4x4 and intrinsics."""
        T44 = np.asarray(T44, np.float64)
        K = np.asarray(K, np.float64)
        h, w = image_hw
        # image corners unprojected to depth `scale` in camera coords
        corners_px = np.array(
            [[0, 0], [w, 0], [w, h], [0, h]], np.float64
        )
        rays = np.concatenate(
            [(corners_px - K[:2, 2]) / np.array([K[0, 0], K[1, 1]]),
             np.ones((4, 1))], axis=1
        ) * scale
        pts_cam = np.concatenate([np.zeros((1, 3)), rays], axis=0)
        R, t = T44[:3, :3], T44[:3, 3]
        pts_world = (pts_cam - t) @ R  # inverse transform: R^T (p - t)
        segs = np.stack(
            [np.stack([pts_world[a], pts_world[b]]) for a, b in _FRUSTUM_EDGES]
        )
        self.add_lines(name, segs, color)

    def add_box(
        self,
        name: str,
        corners: np.ndarray,
        color: tuple[int, int, int] | None = None,
    ) -> None:
        """[8, 3] box corners in the data.parse_arkit.CORNER_SIGNS order."""
        corners = np.asarray(corners, np.float32).reshape(8, 3)
        segs = np.stack(
            [np.stack([corners[a], corners[b]]) for a, b in _BOX_EDGES]
        )
        self.add_lines(name, segs, color)

    def add_trajectory(
        self,
        name: str,
        positions: np.ndarray,
        color: tuple[int, int, int] | None = None,
    ) -> None:
        """[T, 3] polyline (e.g. camera centers over time)."""
        p = np.asarray(positions, np.float32).reshape(-1, 3)
        if len(p) < 2:
            return
        self.add_lines(name, np.stack([p[:-1], p[1:]], axis=1), color)

    # -- output ------------------------------------------------------------
    def save(self, out_dir: str | Path) -> Path:
        out = Path(out_dir)
        out.mkdir(parents=True, exist_ok=True)
        scene: dict = {"points": [], "lines": []}
        for ent in self._points:
            save_ply(out / f"{ent['name']}.ply", ent["xyz"], ent["rgb"])
            xyz, rgb = ent["xyz"], ent["rgb"]
            if len(xyz) > self.max_viewer_points:
                sel = np.linspace(
                    0, len(xyz) - 1, self.max_viewer_points
                ).astype(int)
                xyz, rgb = xyz[sel], rgb[sel]
            scene["points"].append({
                "name": ent["name"],
                "xyz": np.round(xyz, 5).tolist(),
                "rgb": rgb.tolist(),
            })
        for ent in self._lines:
            scene["lines"].append({
                "name": ent["name"],
                "seg": np.round(ent["seg"], 5).tolist(),
                "rgb": ent["rgb"],
            })
        (out / "scene.json").write_text(json.dumps(scene))
        (out / "viewer.html").write_text(
            _VIEWER_HTML.replace("__SCENE_JSON__", json.dumps(scene))
        )
        return out


_VIEWER_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>scene3d</title><style>
 body{margin:0;background:#111;color:#ccc;font:12px monospace}
 #hud{position:fixed;top:8px;left:8px;user-select:none}
 canvas{display:block}
</style></head><body>
<div id="hud">drag: orbit &nbsp; wheel: zoom &nbsp; shift-drag: pan</div>
<canvas id="c"></canvas>
<script>
const SCENE = __SCENE_JSON__;
const cv = document.getElementById('c'), ctx = cv.getContext('2d');
let yaw = 0.6, pitch = 0.4, dist = 3, cx = 0, cy = 0, panx = 0, pany = 0;
// center/scale on the data
let all = [];
for (const p of SCENE.points) for (const v of p.xyz) all.push(v);
for (const l of SCENE.lines) for (const s of l.seg) { all.push(s[0]); all.push(s[1]); }
let mean = [0, 0, 0], r = 1;
if (all.length) {
  for (const v of all) { mean[0]+=v[0]; mean[1]+=v[1]; mean[2]+=v[2]; }
  mean = mean.map(x => x / all.length);
  for (const v of all) r = Math.max(r, Math.hypot(v[0]-mean[0], v[1]-mean[1], v[2]-mean[2]));
}
dist = 2.5 * r;
function proj(v) {
  const x = v[0]-mean[0], y = v[1]-mean[1], z = v[2]-mean[2];
  const cy_ = Math.cos(yaw), sy = Math.sin(yaw), cp = Math.cos(pitch), sp = Math.sin(pitch);
  const x1 = cy_*x + sy*z, z1 = -sy*x + cy_*z;
  const y2 = cp*y - sp*z1, z2 = sp*y + cp*z1 + dist;
  if (z2 <= 1e-3) return null;
  const f = 0.9 * Math.min(cv.width, cv.height) / (z2 / r);
  return [cv.width/2 + f*x1/r + panx, cv.height/2 - f*y2/r + pany, z2];
}
function draw() {
  cv.width = innerWidth; cv.height = innerHeight;
  ctx.fillStyle = '#111'; ctx.fillRect(0, 0, cv.width, cv.height);
  for (const p of SCENE.points) {
    for (let i = 0; i < p.xyz.length; i++) {
      const q = proj(p.xyz[i]); if (!q) continue;
      const c = p.rgb[i];
      ctx.fillStyle = `rgb(${c[0]},${c[1]},${c[2]})`;
      ctx.fillRect(q[0], q[1], 2, 2);
    }
  }
  for (const l of SCENE.lines) {
    ctx.strokeStyle = `rgb(${l.rgb[0]},${l.rgb[1]},${l.rgb[2]})`;
    ctx.beginPath();
    for (const s of l.seg) {
      const a = proj(s[0]), b = proj(s[1]); if (!a || !b) continue;
      ctx.moveTo(a[0], a[1]); ctx.lineTo(b[0], b[1]);
    }
    ctx.stroke();
  }
  // legend
  let y = 40;
  ctx.font = '12px monospace';
  for (const p of SCENE.points.concat(SCENE.lines)) {
    const c = Array.isArray(p.rgb[0]) ? p.rgb[0] : p.rgb;
    ctx.fillStyle = `rgb(${c[0]},${c[1]},${c[2]})`;
    ctx.fillText(p.name, 10, y); y += 16;
  }
}
let drag = null;
cv.onmousedown = e => drag = [e.clientX, e.clientY, e.shiftKey];
window.onmouseup = () => drag = null;
window.onmousemove = e => {
  if (!drag) return;
  const dx = e.clientX - drag[0], dy = e.clientY - drag[1];
  if (drag[2]) { panx += dx; pany += dy; }
  else { yaw += dx * 0.01; pitch += dy * 0.01; }
  drag = [e.clientX, e.clientY, drag[2]]; draw();
};
cv.onwheel = e => { dist *= Math.exp(e.deltaY * 0.001); draw(); e.preventDefault(); };
window.onresize = draw;
draw();
</script></body></html>
"""
