"""Checkpoint serialize cadence (``checkpoint_every``).

Reference saves every epoch (src/solver.py:269-274) — kept as the
default. ``checkpoint_every: N`` amortizes the full-state device fetch
for long runs; the last epoch must always save so a finished run is
always resumable.
"""

from types import SimpleNamespace

from aero_tpu.train.solver import Solver


def _stub(checkpoint=True, every=1, epochs=10):
    return SimpleNamespace(checkpoint=checkpoint, checkpoint_every=every,
                           epochs=epochs)


def saved_epochs(stub):
    return [e for e in range(stub.epochs)
            if Solver._should_checkpoint(stub, e)]


def test_default_saves_every_epoch():
    assert saved_epochs(_stub()) == list(range(10))


def test_cadence_skips_but_always_saves_last():
    # epochs 0..9, every=4 -> save after epochs 4, 8 (1-indexed) + last
    assert saved_epochs(_stub(every=4)) == [3, 7, 9]
    # cadence coarser than the run: only the last epoch saves
    assert saved_epochs(_stub(every=100)) == [9]


def test_checkpoint_disabled_never_saves():
    assert saved_epochs(_stub(checkpoint=False, every=1)) == []
