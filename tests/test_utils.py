"""History recording, checkpoint/resume, timing utilities."""

import numpy as np

from psba_tpu.solvers import SolverConfig
from psba_tpu.solvers.hybrid import solve


def test_history_recording(prob_synth):
    res = solve(prob_synth, SolverConfig(record_history=True))
    assert res.history is not None
    rows = res.history[~np.isnan(res.history[:, 0])]
    assert len(rows) == res.iterations
    # itno strictly increasing, errors decreasing overall
    assert np.all(np.diff(rows[:, 0]) == 1)
    assert rows[-1, 1] <= rows[0, 1]
    txt = res.format_history()
    assert "itno=0" in txt and "Err=" in txt


def test_checkpoint_resume(prob_synth, tmp_path):
    ck = str(tmp_path / "ckpt")
    res = solve(prob_synth, checkpoint_dir=ck)
    from psba_tpu.utils import checkpoint

    restored = checkpoint.load_latest(ck)
    assert restored is not None
    cams, pts, meta = restored
    np.testing.assert_allclose(cams, res.cams)
    assert meta["itno"] == res.iterations

    # resume: solver restarts from the checkpointed state and stops fast
    res2 = solve(prob_synth, checkpoint_dir=ck)
    assert res2.final_l2 <= res.final_l2 * (1 + 1e-9)


def test_phase_timers_in_solve(prob_synth):
    # hybrid.solve times each phase with PhaseTimers (the reference's
    # clock() accumulator report, main.cpp:220-227)
    res = solve(prob_synth)
    assert "lm" in res.phase_report
    assert "phase timing:" in res.phase_report
