"""CI coverage for tools/staged_train.sh — the watchdog staged trainer that
long TPU runs depend on (docs/WORKFLOW.md §4: the ~28 GB/h host-RSS leak and
the chip-claim futex wedge both require staging + wedge-kill + retry).

The trainer itself is stubbed with a fake ``python`` on PATH so the tests
exercise ONLY the shell logic: stage sequencing, per-stage snapshots, DONE
marker, STOP handling, and the stale-log × idle-CPU wedge detector's
kill-and-retry path.  All knobs are env-tunable, so the watchdog runs at
second-scale here.
"""

import os
import stat
import subprocess

import pytest

SCRIPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools", "staged_train.sh",
)


def _write_shim(path: str, body: str) -> None:
    with open(path, "w", encoding="utf-8") as f:
        f.write("#!/bin/bash\n" + body)
    os.chmod(path, os.stat(path).st_mode | stat.S_IEXEC)


def _run(args, shim_dir, timeout=120, **env_over):
    env = dict(os.environ)
    env["PATH"] = shim_dir + os.pathsep + env["PATH"]
    env.update(
        ATTEMPTS="2", STALE_SECS="1", WEDGE_SAMPLES="2", POLL_SECS="1",
        CLAIM_SECS="0",
    )
    env.update({k: str(v) for k, v in env_over.items()})
    return subprocess.run(
        ["bash", SCRIPT] + args,
        env=env, capture_output=True, text=True, timeout=timeout,
    )


@pytest.fixture()
def dirs(tmp_path):
    shim = tmp_path / "bin"
    shim.mkdir()
    model = tmp_path / "model"
    model.mkdir()
    cfg = tmp_path / "config.json"
    cfg.write_text("{}", encoding="utf-8")
    return str(shim), str(model), str(cfg)


class TestStagedTrain:
    def test_usage_error(self, dirs):
        shim, model, cfg = dirs
        r = _run(["-c", cfg], shim)
        assert r.returncode == 2
        assert "usage:" in r.stderr

    def test_happy_path_stages_snapshots_done(self, dirs, tmp_path):
        """Every stage runs once, exports are snapshotted per stage, DONE
        appears at the end."""
        shim, model, cfg = dirs
        snap = tmp_path / "snaps"
        # fake trainer: record argv, touch train.log, export G_latest.pth
        _write_shim(os.path.join(shim, "python"), f"""
shift  # tools/train.py
echo "$@" >> {model}/calls.txt
touch {model}/train.log
echo "weights-$RANDOM" > {model}/G_latest.pth
exit 0
""")
        r = _run(
            ["-c", cfg, "-m", model, "-s", str(snap), "40", "80"], shim
        )
        assert r.returncode == 0, r.stderr
        calls = open(os.path.join(model, "calls.txt")).read().splitlines()
        assert len(calls) == 2
        assert "-n 40 --cont true" in calls[0]
        assert "-n 80 --cont true" in calls[1]
        assert os.path.exists(str(snap / "G_ep40.pth"))
        assert os.path.exists(str(snap / "G_ep80.pth"))
        assert os.path.exists(os.path.join(model, "DONE"))

    def test_stop_file_exits_cleanly(self, dirs):
        shim, model, cfg = dirs
        _write_shim(os.path.join(shim, "python"), "exit 0\n")
        open(os.path.join(model, "STOP"), "w").close()
        r = _run(["-c", cfg, "-m", model, "40"], shim)
        assert r.returncode == 0
        assert not os.path.exists(os.path.join(model, "DONE"))
        assert "STOP file" in open(
            os.path.join(model, "staged_train.log")
        ).read()

    def test_wedge_killed_and_retried(self, dirs):
        """Attempt 1 simulates a chip-claim wedge (no CPU, no log writes) —
        the watchdog must kill it by PID and retry; attempt 2 succeeds."""
        shim, model, cfg = dirs
        _write_shim(os.path.join(shim, "python"), f"""
if [ ! -f {model}/.tried ]; then
  touch {model}/.tried
  sleep 600  # futex-wedge stand-in: log stale AND zero CPU
  exit 3
fi
touch {model}/train.log
echo ok > {model}/G_latest.pth
exit 0
""")
        r = _run(["-c", cfg, "-m", model, "40"], shim, timeout=180)
        assert r.returncode == 0, r.stderr
        log = open(os.path.join(model, "staged_train.log")).read()
        assert "WEDGE:" in log
        assert "attempt 2" in log
        assert os.path.exists(os.path.join(model, "DONE"))

    def test_persistent_failure_gives_up(self, dirs):
        """A stage that fails every attempt exits 1 without DONE."""
        shim, model, cfg = dirs
        _write_shim(os.path.join(shim, "python"), "exit 7\n")
        r = _run(["-c", cfg, "-m", model, "40"], shim)
        assert r.returncode == 1
        assert not os.path.exists(os.path.join(model, "DONE"))
        assert "FAILED after 2 attempts" in open(
            os.path.join(model, "staged_train.log")
        ).read()
