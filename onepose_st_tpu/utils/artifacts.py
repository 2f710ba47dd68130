"""Versioned training-artifact registry.

The service-free analogue of the reference's W&B artifact callback
(src/callbacks/wandb_callbacks.py:17-83 `UploadCheckpointsAsArtifact`):
each `log_artifact` call snapshots a set of files into
`<root>/<name>/v<N>/` with a manifest recording per-file sha256, size,
and caller metadata (step, metrics, config hash). Versions are
append-only; `latest(name)` and `get(name, version)` resolve them back.
No external service, no deletion — the durable record a training run
leaves behind next to its checkpoints.
"""
from __future__ import annotations

import hashlib
import json
import shutil
import time
from pathlib import Path


def _sha256(path: Path, chunk: int = 1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


class ArtifactRegistry:
    def __init__(self, root: str | Path):
        self.root = Path(root)

    def _versions(self, name: str, complete_only: bool = True) -> list[int]:
        d = self.root / name
        if not d.is_dir():
            return []
        out = []
        for p in d.iterdir():
            if p.name.startswith("v") and p.name[1:].isdigit() and (
                not complete_only or (p / "manifest.json").exists()
            ):
                out.append(int(p.name[1:]))
        return sorted(out)

    def log_artifact(
        self,
        name: str,
        files: dict[str, str | Path],
        metadata: dict | None = None,
    ) -> Path:
        """Snapshot `files` ({name-in-artifact: source path}) as the next
        version of `name`. Directories are copied recursively (checkpoint
        dirs are directories of orbax shards). Returns the version dir."""
        # Next version counts ALL vN dirs (even manifest-less ones left by a
        # crashed log_artifact), and files are staged into a temp dir that is
        # atomically renamed to vN only once the manifest is written — a crash
        # mid-copy can never wedge the registry name.
        vers = self._versions(name, complete_only=False)
        vdir = self.root / name / f"v{(vers[-1] + 1) if vers else 0}"
        stage = vdir.parent / f".tmp-{vdir.name}"
        if stage.exists():
            shutil.rmtree(stage)
        stage.mkdir(parents=True)
        entries = {}
        for rel, src in files.items():
            src = Path(src)
            dst = stage / rel
            if src.is_dir():
                shutil.copytree(src, dst)
                fs = sorted(p for p in dst.rglob("*") if p.is_file())
                entries[rel] = {
                    "kind": "dir",
                    "n_files": len(fs),
                    "bytes": sum(p.stat().st_size for p in fs),
                    "sha256": hashlib.sha256(
                        b"".join(
                            f"{p.relative_to(dst)}:{_sha256(p)}\n".encode()
                            for p in fs
                        )
                    ).hexdigest(),
                }
            else:
                dst.parent.mkdir(parents=True, exist_ok=True)
                shutil.copy2(src, dst)
                entries[rel] = {
                    "kind": "file",
                    "bytes": dst.stat().st_size,
                    "sha256": _sha256(dst),
                }
        manifest = {
            "name": name,
            "version": int(vdir.name[1:]),
            "created_unix": time.time(),
            "files": entries,
            "metadata": metadata or {},
        }
        (stage / "manifest.json").write_text(json.dumps(manifest, indent=1))
        stage.rename(vdir)
        return vdir

    def latest(self, name: str) -> Path | None:
        vers = self._versions(name)
        return self.root / name / f"v{vers[-1]}" if vers else None

    def get(self, name: str, version: int) -> Path:
        p = self.root / name / f"v{version}"
        if not (p / "manifest.json").exists():
            raise FileNotFoundError(p)
        return p

    def manifest(self, name: str, version: int | None = None) -> dict:
        p = self.latest(name) if version is None else self.get(name, version)
        if p is None:
            raise FileNotFoundError(self.root / name)
        return json.loads((p / "manifest.json").read_text())

    def verify(self, name: str, version: int | None = None) -> bool:
        """Re-hash a stored version against its manifest (bit-rot check)."""
        p = self.latest(name) if version is None else self.get(name, version)
        if p is None:
            return False
        man = json.loads((p / "manifest.json").read_text())
        for rel, e in man["files"].items():
            tgt = p / rel
            if e["kind"] == "file":
                if not tgt.is_file() or _sha256(tgt) != e["sha256"]:
                    return False
            else:
                fs = sorted(q for q in tgt.rglob("*") if q.is_file())
                h = hashlib.sha256(
                    b"".join(
                        f"{q.relative_to(tgt)}:{_sha256(q)}\n".encode()
                        for q in fs
                    )
                ).hexdigest()
                if h != e["sha256"]:
                    return False
        return True
