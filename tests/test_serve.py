"""Continuous serving (``plumekit serve`` / :mod:`plumekit.infer.serve`).

The reference's batch drivers double as a primitive serving loop — rerun
``main()`` and the processed-file log skips what's done
(``plume_identifier_rg.py:537-576``). Contract under test here: worklog-
idempotent restarts, atomic outputs, the settle guard for in-flight
uploads, watch-mode pickup of new arrivals, and int8 deferral until a
calibratable granule lands.
"""

import os
import threading
import time

import numpy as np

from plumekit.config.paths import PathsConfig
from plumekit.infer.serve import scan_pending, serve_loop
from plumekit.io.granule import Granule, save_granule
from plumekit.train.checkpoint import WorkLog, save_model_config


def _put_granule(mdir, name, rng=None, shape=(96, 96), zero=False):
    aod = (np.zeros(shape, np.float32) if zero
           else rng.random(shape).astype(np.float32))
    g = Granule(name=name, lat=np.zeros(shape), lon=np.zeros(shape),
                layers={"t0": aod})
    p = os.path.join(mdir, f"{name}.npz")
    save_granule(p, g)
    return p


def _small_ckpt(root):
    """Persist a tiny architecture record so the serve CLI builds an
    8-base/depth-2 net (untrained weights are fine for plumbing tests)."""
    from plumekit.config.train import UNetConfig

    ckpt = os.path.join(root, PathsConfig().model_dir, "checkpoints")
    save_model_config(ckpt, UNetConfig(in_channels=2, base_features=8,
                                       depth=2, compute_dtype="float32"))


# ---------------------------------------------------------------- unit core


def test_scan_pending_worklog_settle_and_extensions(tmp_path, rng):
    mdir = str(tmp_path / "gr")
    os.makedirs(mdir)
    a = _put_granule(mdir, "a", rng)
    b = _put_granule(mdir, "b", rng)
    (tmp_path / "gr" / "notes.txt").write_text("not a granule")
    log = WorkLog(str(tmp_path / "log.txt"))
    old = time.time() - 60
    os.utime(a, (old, old))
    os.utime(b, (old, old))

    got = scan_pending(mdir, log, (".npz",), settle_s=2.0)
    assert got == [a, b]

    log.mark("a.npz")
    assert scan_pending(mdir, log, (".npz",), settle_s=2.0) == [b]

    # a file still being written (fresh mtime) is deferred, then picked up
    c = _put_granule(mdir, "c", rng)
    assert scan_pending(mdir, log, (".npz",), settle_s=5.0) == [b]
    os.utime(c, (old, old))
    assert scan_pending(mdir, log, (".npz",), settle_s=5.0) == [b, c]

    # a missing scan dir is an empty backlog, not a crash
    assert scan_pending(str(tmp_path / "nope"), log, (".npz",)) == []


def test_serve_loop_once_and_max_cycles(tmp_path, rng):
    mdir = str(tmp_path / "gr")
    os.makedirs(mdir)
    for i in range(3):
        _put_granule(mdir, f"g{i}", rng)
    log = WorkLog(str(tmp_path / "log.txt"))

    served_paths = []

    def process(paths):
        for p in paths:
            served_paths.append(p)
            log.mark(os.path.basename(p))
        return len(paths)

    stats = serve_loop(mdir, log, process, (".npz",), once=True,
                       settle_s=0.0)
    assert stats.stopped_by == "once" and stats.served == 3
    assert len(served_paths) == 3 and stats.deferred_last_cycle == 0

    # a processor that cannot serve yet defers; max_cycles bounds the loop
    stats = serve_loop(mdir, WorkLog(str(tmp_path / "log2.txt")),
                       lambda paths: 0, (".npz",), poll_s=0.01,
                       max_cycles=3, settle_s=0.0)
    assert stats.stopped_by == "max_cycles"
    assert stats.cycles == 3 and stats.served == 0
    assert stats.deferred_last_cycle == 3


def test_serve_loop_idle_exit_and_stop_event(tmp_path):
    mdir = str(tmp_path / "gr")
    os.makedirs(mdir)
    log = WorkLog(str(tmp_path / "log.txt"))
    stats = serve_loop(mdir, log, lambda p: 0, (".npz",), poll_s=0.01,
                       idle_exit=2, settle_s=0.0)
    assert stats.stopped_by == "idle" and stats.cycles == 2

    ev = threading.Event()
    ev.set()
    stats = serve_loop(mdir, log, lambda p: 0, (".npz",), stop_event=ev)
    assert stats.stopped_by == "stop_event" and stats.cycles == 0


# ----------------------------------------------------------------- CLI e2e


def test_cli_serve_once_resume_idempotent(tmp_path, rng):
    """serve --once drains the backlog; a re-run serves only new arrivals
    (worklog semantics: the deleted output of a done granule is NOT
    regenerated — exactly the reference's processed-file-log rerun)."""
    from plumekit.cli import main as cli_main

    root = str(tmp_path)
    _small_ckpt(root)
    paths = PathsConfig(root=root)
    mdir = paths.ensure("maiac_dir")
    for i in range(2):
        _put_granule(mdir, f"s{i}", rng)

    assert cli_main(["serve", "--root", root, "--once", "--settle", "0",
                     "--tile", "64"]) == 0
    pred_dir = os.path.join(root, "processed", "predictions")
    preds = sorted(f for f in os.listdir(pred_dir) if f.endswith(".npz"))
    assert preds == ["s0_pred.npz", "s1_pred.npz"]
    log_path = os.path.join(pred_dir, "served_granules.txt")
    assert sorted(open(log_path).read().split()) == ["s0.npz", "s1.npz"]
    p = np.load(os.path.join(pred_dir, "s0_pred.npz"))
    assert p["probs"].shape == (96, 96) and p["mask"].dtype == bool

    # restart: only the new granule is served; a done granule is skipped
    # even though its output was deleted (log is the source of truth)
    os.remove(os.path.join(pred_dir, "s0_pred.npz"))
    _put_granule(mdir, "s2", rng)
    assert cli_main(["serve", "--root", root, "--once", "--settle", "0",
                     "--tile", "64"]) == 0
    preds = sorted(f for f in os.listdir(pred_dir) if f.endswith(".npz"))
    assert preds == ["s1_pred.npz", "s2_pred.npz"]


def test_cli_serve_watch_picks_up_new_granule(tmp_path, rng):
    """Watch mode: a granule dropped into the directory mid-run is served
    on a later poll cycle; idle-exit then ends the loop."""
    from plumekit.cli import main as cli_main

    root = str(tmp_path)
    _small_ckpt(root)
    paths = PathsConfig(root=root)
    mdir = paths.ensure("maiac_dir")
    _put_granule(mdir, "first", rng)
    pred_dir = os.path.join(root, "processed", "predictions")

    rc = {}

    def run():
        # generous idle budget (120 x 0.05 s = 6 s): on the loaded 1-core
        # host the main thread can lag several seconds behind the loop,
        # and an early idle-exit would flake the pickup assertion
        rc["code"] = cli_main(["serve", "--root", root, "--poll", "0.05",
                               "--idle-exit", "120", "--settle", "0",
                               "--tile", "64"])

    t = threading.Thread(target=run)
    t.start()
    try:
        # wait for the first granule's output, then drop a second one in
        deadline = time.time() + 120
        while time.time() < deadline and not os.path.exists(
                os.path.join(pred_dir, "first_pred.npz")):
            time.sleep(0.05)
        assert os.path.exists(os.path.join(pred_dir, "first_pred.npz"))
        _put_granule(mdir, "second", rng)
        t.join(timeout=120)
        assert not t.is_alive(), "serve loop did not idle-exit"
    finally:
        t.join(timeout=1)
    assert rc["code"] == 0
    assert os.path.exists(os.path.join(pred_dir, "second_pred.npz"))


def test_worklog_items_snapshot(tmp_path):
    log = WorkLog(str(tmp_path / "log.txt"))
    assert log.items() == set()
    log.mark("a.npz")
    log.mark("b.npz")
    assert log.items() == {"a.npz", "b.npz"}
    assert log.done("a.npz") and not log.done("a")


def test_sweep_stale_tmps_spares_live_writers(tmp_path):
    """The startup sweep removes a crashed writer's leftovers but must not
    delete a concurrently running writer's in-flight tmp (its os.replace
    would crash and the prediction would be lost)."""
    from plumekit.cli import _sweep_stale_tmps

    d = str(tmp_path)
    mine = os.path.join(d, f".x_pred.tmp{os.getpid()}.npz")   # live pid
    dead = os.path.join(d, ".y_pred.tmp999999999.npz")        # dead pid
    odd = os.path.join(d, ".z_pred.tmpgarbage.npz")           # not ours
    for p in (mine, dead, odd):
        open(p, "wb").write(b"x")
    _sweep_stale_tmps(d)
    assert os.path.exists(mine) and os.path.exists(odd)
    assert not os.path.exists(dead)


def test_cli_serve_quarantines_poison_granule(tmp_path, rng):
    """A granule whose decode fails (corrupt completed upload) must not
    crash-loop the daemon: the batched pass fails, per-granule isolation
    locates it, it lands in failed_granules.txt, the good granules are
    served, and the next cycle does not retry it."""
    from plumekit.cli import main as cli_main

    root = str(tmp_path)
    _small_ckpt(root)
    paths = PathsConfig(root=root)
    mdir = paths.ensure("maiac_dir")
    # sorts before the good granule, so the stream hits it first
    with open(os.path.join(mdir, "a_corrupt.npz"), "wb") as f:
        f.write(b"this is not an npz archive")
    _put_granule(mdir, "b_good", rng)

    # --once reports the failure via the exit code (batch semantics)
    assert cli_main(["serve", "--root", root, "--once", "--settle", "0",
                     "--tile", "64"]) == 1
    pred_dir = os.path.join(root, "processed", "predictions")
    preds = sorted(f for f in os.listdir(pred_dir) if f.endswith("_pred.npz"))
    assert preds == ["b_good_pred.npz"]
    failed = open(os.path.join(pred_dir, "failed_granules.txt")).read()
    assert failed.split() == ["a_corrupt.npz"]

    # quarantined granule is excluded from later scans: a fresh run serves
    # only new arrivals and exits clean
    _put_granule(mdir, "c_good", rng)
    assert cli_main(["serve", "--root", root, "--once", "--settle", "0",
                     "--tile", "64"]) == 0
    preds = sorted(f for f in os.listdir(pred_dir) if f.endswith("_pred.npz"))
    assert preds == ["b_good_pred.npz", "c_good_pred.npz"]


def test_cli_serve_int8_defers_until_calibratable(tmp_path, rng):
    """int8 serving refuses to run on degenerate scales: an all-null
    backlog is deferred (nothing marked done), and everything is served
    once a granule with signal lands and calibration succeeds."""
    from plumekit.cli import main as cli_main

    root = str(tmp_path)
    _small_ckpt(root)
    paths = PathsConfig(root=root)
    mdir = paths.ensure("maiac_dir")
    _put_granule(mdir, "ocean", rng, zero=True)

    assert cli_main(["serve", "--root", root, "--once", "--settle", "0",
                     "--tile", "64", "--int8"]) == 0
    pred_dir = os.path.join(root, "processed", "predictions")
    assert not [f for f in os.listdir(pred_dir) if f.endswith("_pred.npz")]

    _put_granule(mdir, "land", rng)
    assert cli_main(["serve", "--root", root, "--once", "--settle", "0",
                     "--tile", "64", "--int8"]) == 0
    preds = sorted(f for f in os.listdir(pred_dir) if f.endswith(".npz"))
    assert preds == ["land_pred.npz", "ocean_pred.npz"]


def test_cli_serve_mesh_sharded(tmp_path, rng):
    """Pod-slice serving through the CLI (VERDICT round-4 #4): serve
    --mesh-devices 2 runs granule groups through make_batch_infer_sharded
    on the 8-virtual-device CPU mesh — incl. a ragged tail (5 granules at
    2 devices × 2 granules/device = groups of 4) — and the outputs are
    bit-identical to single-device serving."""
    import jax

    from plumekit.cli import main as cli_main

    assert len(jax.devices()) >= 2  # the forced 8-virtual-device mesh
    root = str(tmp_path / "mesh")
    _small_ckpt(root)
    paths = PathsConfig(root=root)
    mdir = paths.ensure("maiac_dir")
    for i in range(5):
        _put_granule(mdir, f"m{i}", rng)

    assert cli_main(["serve", "--root", root, "--once", "--settle", "0",
                     "--tile", "64", "--mesh-devices", "2",
                     "--batch-granules", "2"]) == 0
    pred_dir = os.path.join(root, "processed", "predictions")
    preds = sorted(f for f in os.listdir(pred_dir) if f.endswith(".npz"))
    assert preds == [f"m{i}_pred.npz" for i in range(5)]

    # single-device reference on the same granules (fresh root)
    root1 = str(tmp_path / "single")
    _small_ckpt(root1)
    mdir1 = PathsConfig(root=root1).ensure("maiac_dir")
    import shutil

    for f in os.listdir(mdir):
        shutil.copy(os.path.join(mdir, f), os.path.join(mdir1, f))
    assert cli_main(["serve", "--root", root1, "--once", "--settle", "0",
                     "--tile", "64", "--batch-granules", "1"]) == 0
    pred1 = os.path.join(root1, "processed", "predictions")
    for f in preds:
        a = np.load(os.path.join(pred_dir, f))
        b = np.load(os.path.join(pred1, f))
        np.testing.assert_array_equal(a["probs"], b["probs"])
        np.testing.assert_array_equal(a["mask"], b["mask"])


def test_cli_mesh_flag_validation(tmp_path, rng):
    """--mesh-devices conflicts fail fast with rc=1 (exported / fused /
    too many devices / fewer than 2)."""
    from plumekit.cli import main as cli_main

    root = str(tmp_path)
    _small_ckpt(root)
    mdir = PathsConfig(root=root).ensure("maiac_dir")
    _put_granule(mdir, "g", rng)
    base = ["serve", "--root", root, "--once", "--settle", "0",
            "--tile", "64"]
    assert cli_main(base + ["--mesh-devices", "1"]) == 1
    assert cli_main(base + ["--mesh-devices", "999"]) == 1
    assert cli_main(base + ["--mesh-devices", "2", "--fused"]) == 1
    assert cli_main(base + ["--mesh-devices", "2",
                            "--exported", "/nowhere"]) == 1
