"""CPU smoke coverage for every r5-campaign stage script (VERDICT r4 next #2).

Round 3 burned a chip window on a script that had never executed (the dryrun
hang); round 4's new TPU scripts had zero CPU coverage (weak #3). These tests
run each campaign script END TO END as a subprocess on the CPU backend with
tiny shapes, so "the stage crashes on the chip for repo-side reasons" is a
class of failure that cannot happen again. They assert on the scripts'
*output contracts* (files written, decision lines printed), not numbers —
CPU timings are meaningless.
"""

import json
import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = os.path.join(HERE, "scripts")


def _env(**extra):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env.update(extra)
    return env


def _run(script, args=(), timeout=900, **envkw):
    return subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, script), *args],
        capture_output=True, text=True, cwd=HERE, timeout=timeout,
        env=_env(**envkw),
    )


class TestAbContract:
    """The bench_ab -> marginal_session output contract, both directions
    through the REAL production code (format_result is what bench_ab prints;
    parse_bench_ab_stdout is what marginal_session consumes)."""

    def _mods(self):
        sys.path.insert(0, SCRIPTS)
        try:
            import ab_contract
            import marginal_session
        finally:
            sys.path.pop(0)
        return ab_contract, marginal_session

    def test_roundtrip(self):
        ab, ms = self._mods()
        out = ab.format_result("pallas", 47.123, 44.06, 2.0736)
        got_ms, got_mrays, raw = ms.parse_bench_ab_stdout(out)
        assert got_ms == pytest.approx(47.123, abs=1e-3)
        assert got_mrays == pytest.approx(44.06, abs=1e-2)
        assert raw.startswith("{")

    def test_picks_requested_spec(self):
        ab, ms = self._mods()
        out = (ab.format_result("pallas+s3", 99.0, 1.0, 2.0) + "\n"
               + ab.format_result("pallas", 47.0, 44.0, 2.07))
        got_ms, got_mrays, _ = ms.parse_bench_ab_stdout(out, spec="pallas")
        assert got_mrays == pytest.approx(44.0, abs=1e-2)

    def test_legacy_human_line_fallback(self):
        _, ms = self._mods()
        legacy = ("pallas                  47.1 ms/sample    44.1 Mrays/s "
                  "(marginal, 2.07 Mrays/sample)")
        got_ms, got_mrays, _ = ms.parse_bench_ab_stdout(legacy)
        assert got_ms == pytest.approx(47.1)
        assert got_mrays == pytest.approx(44.1)

    def test_garbage_yields_none(self):
        _, ms = self._mods()
        assert ms.parse_bench_ab_stdout("oops\nnothing here") == (None, None, "")


class TestCalibrateMxuSmoke:
    def test_interpret_mode_end_to_end(self):
        r = _run("calibrate_mxu.py", ["2"], CAL_INTERPRET="1", CAL_R="256")
        assert r.returncode == 0, r.stderr[-2000:]
        # every probe family reported (value or explicit FAILED), and the
        # pre-registered decision line fired
        for token in ("vpu_mt", "mxu 4096x16x128 f32",
                      "composite MXU visit", "relayout", "# decision:"):
            assert token in r.stdout, (token, r.stdout[-3000:])

    def test_decision_rule_states_build_or_close(self):
        r = _run("calibrate_mxu.py", ["2"], CAL_INTERPRET="1", CAL_R="256")
        assert ("-> BUILD" in r.stdout) or ("-> CLOSE" in r.stdout), \
            r.stdout[-2000:]


class TestParityDiagSmoke:
    def test_end_to_end(self, tmp_path):
        round_name = "smoketest"
        out_dir = os.path.join(HERE, "results", round_name)
        try:
            r = _run("parity_diag.py", PARITY_SMOKE="1",
                     RAYZEN_ROUND=round_name)
            assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-2000:])
            txt = os.path.join(out_dir, "parity_diag.txt")
            npz = os.path.join(out_dir, "parity_diag.npz")
            assert os.path.exists(txt) and os.path.exists(npz)
            body = open(txt).read()
            assert "SSIM" in body and "attribution" in body
            raw = np.load(npz)
            assert any(k.startswith("diff_pallas") for k in raw.files)
            # golden-vs-itself (xla vs xla) must be exactly zero diff —
            # proves the diff plumbing measures what it claims
            xla_keys = [k for k in raw.files if k.startswith("diff_xla")]
            assert xla_keys and float(raw[xla_keys[0]].max()) == 0.0
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)


class TestProgressiveSmoke:
    def test_end_to_end(self, tmp_path):
        out_md = str(tmp_path / "prog" / "PROGRESSIVE.md")
        os.makedirs(os.path.dirname(out_md), exist_ok=True)
        r = _run("progressive_1024.py", [out_md],
                 PROG_W="64", PROG_H="48", PROG_SPP="2", PROG_TOTAL="8")
        assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-2000:])
        assert os.path.exists(out_md)
        body = open(out_md).read()
        assert "accumulated spp" in body and "| 8 |" in body
        assert "doubling-ratio" in r.stdout


class TestInteractiveScriptSmoke:
    def test_end_to_end(self, tmp_path):
        out_md = str(tmp_path / "isess" / "INTERACTIVE.md")
        os.makedirs(os.path.dirname(out_md), exist_ok=True)
        r = _run("interactive_1080p.py", timeout=1500,
                 ISESS_W="96", ISESS_H="64", ISESS_OUT=out_md,
                 ISESS_CACHE=str(tmp_path / "cache"))
        assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-2000:])
        body = open(out_md).read()
        assert "PIPELINED session" in body
        assert "DEVICE-RATE pass" in body
        assert "| `click 960 540` |" in body  # full command mix ran
        png = os.path.join(os.path.dirname(out_md), "images",
                           "interactive_1080p.png")
        assert os.path.exists(png)


class TestMarginalSessionSmoke:
    def test_appends_dated_record_from_stub_bench(self, tmp_path,
                                                  monkeypatch):
        """Run marginal_session.py against a stubbed bench_ab (instant) to
        exercise the full subprocess -> parse -> jsonl-append path."""
        # stage a fake repo layout: scripts/{marginal_session,ab_contract,
        # bench_ab stub}
        sdir = tmp_path / "scripts"
        sdir.mkdir()
        for f in ("marginal_session.py", "ab_contract.py"):
            shutil.copy(os.path.join(SCRIPTS, f), sdir / f)
        (sdir / "bench_ab.py").write_text(
            "import sys\nsys.path.insert(0, "
            "__file__.rsplit('/', 1)[0])\n"
            "from ab_contract import format_result\n"
            "print(format_result('pallas', 47.1, 44.06, 2.07))\n"
        )
        r = subprocess.run(
            [sys.executable, str(sdir / "marginal_session.py")],
            capture_output=True, text=True, timeout=120,
            env=_env(RAYZEN_ROUND="rsmoke"), cwd=str(tmp_path),
        )
        assert r.returncode == 0, (r.stdout, r.stderr)
        out = tmp_path / "results" / "rsmoke" / "marginal_sessions.jsonl"
        assert out.exists()
        rec = json.loads(out.read_text().strip().splitlines()[-1])
        assert rec["mrays_marginal"] == pytest.approx(44.06, abs=1e-2)
        assert rec["ms_per_sample"] == pytest.approx(47.1, abs=1e-2)
        assert rec["utc"].endswith("Z") and rec["rc"] == 0


class TestBenchAbSmoke:
    def test_end_to_end_tiny(self, tmp_path):
        """bench_ab.py itself (not just its output contract) runs end to end
        on CPU at smoke shape and emits a JSON line the marginal-session
        parser accepts — the ab_split1/2 campaign stages' crash class."""
        r = _run("bench_ab.py", ["pallas:2"], timeout=1200,
                 RAYZEN_AB_W="64", RAYZEN_AB_H="36", RAYZEN_AB_LO="1",
                 RAYZEN_AB_HI="2", RAYZEN_AB_PIPE="1", RAYZEN_AB_REPS="1")
        assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-2000:])
        ab, ms = TestAbContract._mods(None)
        got_ms, got_mrays, _ = ms.parse_bench_ab_stdout(r.stdout,
                                                        spec="pallas:2")
        assert got_ms is not None and got_mrays is not None, r.stdout[-800:]

    def test_split_spec_parses_and_runs(self, tmp_path):
        """One split-bounce spec through the real script — the exact variant
        class ab_split1 measures (s-spec parsing + continuation kernels)."""
        r = _run("bench_ab.py", ["pallas:2+s1o"], timeout=1200,
                 RAYZEN_AB_W="64", RAYZEN_AB_H="36", RAYZEN_AB_LO="1",
                 RAYZEN_AB_HI="2", RAYZEN_AB_PIPE="1", RAYZEN_AB_REPS="1")
        assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-2000:])
        assert '"spec": "pallas:2+s1o"' in r.stdout, r.stdout[-800:]


class TestBenchLargeSmoke:
    def test_tiered_end_to_end_tiny(self, tmp_path):
        """bench_large.py (large_base/s1oe/s1o stages) at 4 instances /
        smoke resolution: scene synth, SSIM gate vs the XLA oracle, tiered
        pack, timing loop, final Mrays stdout contract."""
        r = subprocess.run(
            [sys.executable, os.path.join(SCRIPTS, "bench_large.py"),
             "4", "tiered", "64", ""],
            capture_output=True, text=True, cwd=str(tmp_path), timeout=1200,
            env=_env(RAYZEN_LARGE_W="64", RAYZEN_LARGE_H="36",
                     RAYZEN_LARGE_SPP="1", RAYZEN_LARGE_GATE_W="64",
                     RAYZEN_LARGE_GATE_H="36", RAYZEN_LARGE_REPS="1",
                     RAYZEN_TREE_BUDGET_MB="40"),
        )
        assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-2000:])
        assert "correctness gate" in r.stderr
        # stdout contract: final line is the bare Mrays float
        float(r.stdout.strip().splitlines()[-1])


class TestCalibrateWalkSmoke:
    def test_interpret_mode_end_to_end(self, tmp_path):
        """calibrate_walk.py (calibrate_walk stage) in interpreter mode:
        counted probes run, the JSON artifact lands with the probe schema."""
        jpath = str(tmp_path / "calibration.json")
        r = _run("calibrate_walk.py", ["2", "--json", jpath], timeout=1200,
                 CAL_INTERPRET="1", CAL_PACKETS="1",
                 CAL_VARIANTS="full,leafless")
        assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-2000:])
        payload = json.loads(open(jpath).read())
        assert payload["probes"], payload
        rec = payload["probes"][0]
        for key in ("load", "variant", "iters_per_packet", "ns_per_iter",
                    "leaf_visits_per_packet"):
            assert key in rec, rec


class TestBenchReplaySmoke:
    """bench.py's chip-down path (what actually runs when the tunnel flaps
    mid-campaign): bounded probe -> round-scoped replay with embedded
    provenance, or rc=1 when there is nothing in-round to replay."""

    def _stage(self, tmp_path):
        shutil.copy(os.path.join(HERE, "bench.py"), tmp_path / "bench.py")
        return tmp_path / "bench.py"

    def _run_bench(self, bench, tmp_path):
        return subprocess.run(
            [sys.executable, str(bench)], capture_output=True, text=True,
            timeout=300, cwd=str(tmp_path),
            env=_env(RAYZEN_ROUND="rsmoke", RAYZEN_PROBE_ATTEMPTS="1"),
        )

    def test_replays_in_round_capture_with_provenance(self, tmp_path):
        bench = self._stage(tmp_path)
        rdir = tmp_path / "results" / "rsmoke"
        rdir.mkdir(parents=True)
        (rdir / "bench_1.txt").write_text(
            '# noise\n{"metric": "mrays_per_s", "value": 113.49, '
            '"unit": "Mrays/s", "vs_baseline": 0.57, "sha": "abc1234"}\n'
        )
        r = self._run_bench(bench, tmp_path)
        assert r.returncode == 0, (r.stdout, r.stderr[-1500:])
        rec = json.loads(r.stdout.strip().splitlines()[-1])
        assert rec["value"] == pytest.approx(113.49)
        assert rec["replayed_from"].endswith("bench_1.txt")
        assert rec["sha"] == "abc1234" and "captured_utc" in rec

    def test_other_round_capture_is_not_replayed(self, tmp_path):
        bench = self._stage(tmp_path)
        other = tmp_path / "results" / "r4"
        other.mkdir(parents=True)
        (other / "bench_1.txt").write_text(
            '{"metric": "mrays_per_s", "value": 999.0, "unit": "Mrays/s", '
            '"vs_baseline": 5.0}\n'
        )
        r = self._run_bench(bench, tmp_path)
        assert r.returncode == 1, (r.stdout, r.stderr[-1500:])
        assert "999" not in r.stdout


class TestDecideRules:
    """scripts/r5_decide.py must parse the post-campaign stage outputs it
    will be pointed at — contract-tested here with canned records so a
    format drift can never silently yield 'no data' on the chip."""

    def _decide(self, results_dir):
        return subprocess.run(
            [sys.executable, os.path.join(SCRIPTS, "r5_decide.py"),
             str(results_dir)],
            capture_output=True, text=True, timeout=120, cwd=HERE,
        )

    def test_spp_rule_adopts_on_big_win(self, tmp_path):
        recs = [
            {"metric": "m", "value": 100.0, "unit": "Mrays/s",
             "vs_baseline": 0.5, "spp": 64, "sha": "x"},
            {"metric": "m", "value": 120.0, "unit": "Mrays/s",
             "vs_baseline": 0.6, "spp": 128, "sha": "x"},
            {"metric": "m", "value": 98.0, "unit": "Mrays/s",
             "vs_baseline": 0.49, "spp": 64, "sha": "x"},
            {"metric": "m", "value": 115.0, "unit": "Mrays/s",
             "vs_baseline": 0.57, "spp": 128, "sha": "x"},
        ]
        (tmp_path / "ab_spp.txt").write_text(
            "# noise line\n" + "\n".join(json.dumps(r) for r in recs) + "\n")
        r = self._decide(tmp_path)
        assert r.returncode == 0, r.stderr[-1500:]
        assert "adopt RAYZEN_BENCH_SPP default 128" in r.stdout

    def test_spp_rule_holds_inside_drift(self, tmp_path):
        recs = [
            {"metric": "m", "value": 100.0, "unit": "Mrays/s",
             "vs_baseline": 0.5, "spp": 64, "sha": "x"},
            {"metric": "m", "value": 103.0, "unit": "Mrays/s",
             "vs_baseline": 0.51, "spp": 128, "sha": "x"},
        ]
        (tmp_path / "ab_spp.txt").write_text(
            "\n".join(json.dumps(r) for r in recs) + "\n")
        r = self._decide(tmp_path)
        assert r.returncode == 0, r.stderr[-1500:]
        assert "stays 64" in r.stdout

    def test_fuse_rule_parses_ab_records(self, tmp_path):
        sys.path.insert(0, SCRIPTS)
        try:
            import ab_contract
        finally:
            sys.path.pop(0)
        lines = [ab_contract.format_result("pallas", 48.0, 114.0, 5.48),
                 ab_contract.format_result("pallas+f2", 43.0, 127.0, 5.48)]
        (tmp_path / "ab_fuse.txt").write_text("\n".join(lines) + "\n")
        r = self._decide(tmp_path)
        assert r.returncode == 0, r.stderr[-1500:]
        assert "adopt sample_fuse=2" in r.stdout


class TestTransportProbeSmoke:
    def test_end_to_end_tiny(self):
        r = _run("transport_probe.py", TP_W="96", TP_H="64", TP_N="2")
        assert r.returncode == 0, r.stderr[-2000:]
        rec = json.loads(
            [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1])
        assert rec["probe"] == "transport_camera_uploads"
        for key in ("ms_identical_inflight", "ms_freshhost_inflight",
                    "ms_freshhost_sync", "ms_distinctdev_inflight"):
            assert rec[key] > 0
        assert "# interpretation" in r.stdout
