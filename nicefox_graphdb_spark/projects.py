"""Project + API-key administration over a data directory.

Reference parity: one project = one isolated database under a data dir
(reference maps projects to SQLite files, src/cli.ts create/delete/list/
wipe/clone; API keys in ``api-keys.json``, src/cli-helpers.ts:38-60, key
format src/auth.ts:194-203, optional per-project restriction
src/auth.ts:8-16). Here a project is a durable-store DIRECTORY
(``<data_dir>/<project>``) that ``DurableGraph`` opens lazily — creating a
project is making the directory; the manifest bootstraps on first write.

Driver-local filesystem only (os-level calls), like the reference CLI; a
cluster deployment would point ``--data`` at a mounted volume or manage
projects through the object-store console.
"""

from __future__ import annotations

import json
import os
import secrets
import shutil
from dataclasses import dataclass

_ALPHABET = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
)


def _check_name(project: str) -> str:
    if not project or any(c in project for c in "/\\.\0") or project.startswith("_"):
        raise ValueError(f"invalid project name {project!r}")
    return project


def project_path(data_dir: str, project: str) -> str:
    return os.path.join(data_dir, _check_name(project))


def ensure_data_dir(data_dir: str) -> None:
    os.makedirs(data_dir, exist_ok=True)


def create_project(data_dir: str, project: str) -> bool:
    """Returns False if the project already existed."""
    ensure_data_dir(data_dir)
    path = project_path(data_dir, project)
    if os.path.isdir(path):
        return False
    os.makedirs(path)
    return True


def delete_project(data_dir: str, project: str) -> bool:
    path = project_path(data_dir, project)
    if not os.path.isdir(path):
        return False
    shutil.rmtree(path)
    keys = load_api_keys(data_dir)
    pruned = {k: v for k, v in keys.items() if v.get("project") != project}
    if pruned != keys:
        save_api_keys(data_dir, pruned)
    return True


def wipe_project(data_dir: str, project: str) -> bool:
    """Clear the project's data but keep the project (reference `wipe`)."""
    path = project_path(data_dir, project)
    if not os.path.isdir(path):
        return False
    for entry in os.listdir(path):
        full = os.path.join(path, entry)
        shutil.rmtree(full) if os.path.isdir(full) else os.remove(full)
    return True


def clone_project(data_dir: str, source: str, target: str) -> None:
    """Copy a project's store wholesale (reference `clone`). Safe because
    durable-store data files are immutable — only manifests point at them,
    and the copy carries both."""
    src = project_path(data_dir, source)
    dst = project_path(data_dir, target)
    if not os.path.isdir(src):
        raise FileNotFoundError(f"project {source!r} does not exist")
    if os.path.exists(dst):
        raise FileExistsError(f"project {target!r} already exists")
    shutil.copytree(src, dst)


@dataclass
class ProjectInfo:
    name: str
    size_bytes: int
    n_files: int


def list_projects(data_dir: str) -> list[ProjectInfo]:
    if not os.path.isdir(data_dir):
        return []
    out = []
    for name in sorted(os.listdir(data_dir)):
        full = os.path.join(data_dir, name)
        if not os.path.isdir(full) or name.startswith("_"):
            continue
        size = n = 0
        for root, _dirs, files in os.walk(full):
            for f in files:
                try:
                    size += os.path.getsize(os.path.join(root, f))
                    n += 1
                except OSError:
                    pass
        out.append(ProjectInfo(name, size, n))
    return out


# -- API keys ----------------------------------------------------------------
def api_keys_path(data_dir: str) -> str:
    return os.path.join(data_dir, "api-keys.json")


def load_api_keys(data_dir: str) -> dict[str, dict]:
    """{key: {"project": name-or-None}} — project None = all projects
    (reference src/auth.ts:8-16)."""
    path = api_keys_path(data_dir)
    if os.path.exists(path):
        try:
            with open(path) as f:
                return json.load(f)
        except (OSError, json.JSONDecodeError):
            return {}
    return {}


def save_api_keys(data_dir: str, keys: dict[str, dict]) -> None:
    ensure_data_dir(data_dir)
    tmp = api_keys_path(data_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(keys, f, indent=2)
        f.write("\n")
    os.replace(tmp, api_keys_path(data_dir))


def generate_api_key() -> str:
    """32 alphanumeric chars (reference src/auth.ts:194-203) — but from a
    CSPRNG, not Math.random."""
    return "".join(secrets.choice(_ALPHABET) for _ in range(32))


def add_api_key(data_dir: str, project: str | None) -> str:
    keys = load_api_keys(data_dir)
    key = generate_api_key()
    keys[key] = {"project": project}
    save_api_keys(data_dir, keys)
    return key


def remove_api_keys(data_dir: str, prefix: str) -> int:
    """Remove every key starting with the prefix (reference
    `apikey remove <prefix>`); returns how many were removed."""
    if not prefix:
        raise ValueError("empty prefix would remove every key")
    keys = load_api_keys(data_dir)
    doomed = [k for k in keys if k.startswith(prefix)]
    for k in doomed:
        del keys[k]
    if doomed:
        save_api_keys(data_dir, keys)
    return len(doomed)
