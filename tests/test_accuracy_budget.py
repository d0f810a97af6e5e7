"""Approximation-stack accuracy budget (VERDICT r4 #3).

Re-measures the tiny-geometry drift of every shipped approximation
(DeepCache 2/3, CFG-interval, ToMe, PAG, and the shipped combos) on the
PRODUCT sampling path and asserts each stays inside the committed bounds
in ``tests/goldens/accuracy_budget.json`` (recorded × BOUND_SLACK).

A refactor that doubles an approximation's drift amplitude (≈4× rel_mse)
fails here; one that silently *disables* an approximation (drift → 0)
fails the nonzero floor. Regenerate goldens deliberately with::

    python tools/accuracy_budget.py --golden
"""
import json
import os

import pytest

from tools.accuracy_budget import GOLDEN, _tiny_parts, measure


@pytest.fixture(scope='module')
def drift():
    return measure(_tiny_parts())


@pytest.fixture(scope='module')
def golden():
    assert os.path.exists(GOLDEN), (
        'missing tests/goldens/accuracy_budget.json — run '
        'python tools/accuracy_budget.py --golden')
    with open(GOLDEN) as f:
        return json.load(f)


def test_all_configs_covered(drift, golden):
    assert set(drift) == set(golden['tiny_geometry']), (
        'config set drifted from goldens — regenerate')


@pytest.mark.parametrize('metric', ['rel_mse', 'max_rel'])
def test_drift_within_budget(drift, golden, metric):
    for name, entry in golden['tiny_geometry'].items():
        got = drift[name][metric]
        bound = entry['bound'][metric]
        assert got <= bound, (
            f'{name}: {metric}={got:.3e} exceeds committed bound '
            f'{bound:.3e} (recorded {entry["recorded"][metric]:.3e}) — '
            'the approximation degraded; investigate before regenerating '
            'goldens')


def test_drift_nonzero(drift, golden):
    """Every approximation must actually engage: drift ≥ recorded/10 (a
    silently-disabled accelerator reads as a quality 'improvement' but is
    a product regression — its speed claim would be a lie)."""
    for name, entry in golden['tiny_geometry'].items():
        floor = entry['recorded']['rel_mse'] / 10.0
        assert drift[name]['rel_mse'] >= floor, (
            f'{name}: rel_mse={drift[name]["rel_mse"]:.3e} below floor '
            f'{floor:.3e} — is the approximation still wired up?')
