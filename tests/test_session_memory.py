"""Driver-heap sizing probe (session.py): the cgroup limit must be
found at the process's OWN cgroup path (ADVICE r5 — nested slices with
MemoryMax but no cgroup namespace), not just the mount root."""

from __future__ import annotations

import builtins
import io

from wrf_to_geodataframe_spark import session


def _fake_fs(monkeypatch, files: dict[str, str]):
    real_open = builtins.open

    def fake_open(path, *a, **k):
        if path in files:
            return io.StringIO(files[path])
        if isinstance(path, str) and path.startswith(
            ("/proc/", "/sys/fs/cgroup")
        ):
            raise OSError(f"fake fs: {path} absent")
        return real_open(path, *a, **k)

    monkeypatch.setattr(builtins, "open", fake_open)


def test_cgroup_paths_resolve_own_v2_slice_and_ancestors(monkeypatch):
    _fake_fs(
        monkeypatch,
        {"/proc/self/cgroup": "0::/system.slice/myapp.service\n"},
    )
    paths = session._cgroup_limit_paths()
    assert paths[0] == "/sys/fs/cgroup/system.slice/myapp.service/memory.max"
    assert paths[1] == "/sys/fs/cgroup/system.slice/memory.max"
    assert "/sys/fs/cgroup/memory.max" in paths  # mount-root fallback


def test_cgroup_paths_resolve_v1_memory_controller(monkeypatch):
    _fake_fs(
        monkeypatch,
        {"/proc/self/cgroup": "4:memory:/docker/abc123\n3:cpu:/\n"},
    )
    paths = session._cgroup_limit_paths()
    assert (
        "/sys/fs/cgroup/memory/docker/abc123/memory.limit_in_bytes" in paths
    )


def test_driver_memory_honors_nested_slice_limit(monkeypatch):
    gib = 1024**3
    _fake_fs(
        monkeypatch,
        {
            "/proc/meminfo": f"MemTotal: {256 * 1024 * 1024} kB\n",  # 256 GiB
            "/proc/self/cgroup": "0::/a/b\n",
            # root says unlimited, the nested slice holds the real cap
            "/sys/fs/cgroup/memory.max": "max\n",
            "/sys/fs/cgroup/a/b/memory.max": f"{8 * gib}\n",
        },
    )
    # 40% of the 8 GiB cgroup limit, floored at 2g -> 3g (NOT 32g from
    # the 256 GiB host total)
    assert session._default_driver_memory() == "3g"


def test_driver_memory_unlimited_cgroup_uses_host_total(monkeypatch):
    _fake_fs(
        monkeypatch,
        {
            "/proc/meminfo": f"MemTotal: {64 * 1024 * 1024} kB\n",  # 64 GiB
            "/proc/self/cgroup": "0::/\n",
            "/sys/fs/cgroup/memory.max": "max\n",
        },
    )
    assert session._default_driver_memory() == "25g"  # min(32, 64*0.4)
