"""CI dry-run of the real-weight parity harness (VERDICT r2 task 7):
``tools/validate_reference.py --tiny`` must execute every config's plumbing
end to end and emit the report + reference-named images."""
import json
import os
import sys


def test_validate_reference_tiny(tmp_path):
    sys.path.insert(0, '/root/repo/tools')
    import validate_reference as vr

    out = str(tmp_path / 'val')
    rc = vr.main(['--tiny', '--out', out])
    assert rc == 0
    with open(os.path.join(out, 'parity_report.json')) as f:
        report = json.load(f)
    assert report['tiny'] is True
    cfgs = report['configs']
    assert set(cfgs) == {'t2i_base', 'linear_style', 'clustered_threshold',
                         'img2img_guided', 'text2text'}
    for name, cfg in cfgs.items():
        assert 'skipped' not in cfg, (name, cfg)
        assert os.path.exists(os.path.join(out, cfg['reference_golden']))
    # numerics gate present and passing at tiny scale (fp32 vs fp32)
    t2i = cfgs['t2i_base']
    assert 'latent_mse_vs_cpu_fp32' in t2i
    assert t2i['latent_mse_gate_1e-2'] is True


def test_validate_reference_subset(tmp_path):
    sys.path.insert(0, '/root/repo/tools')
    import validate_reference as vr

    out = str(tmp_path / 'val2')
    rc = vr.main(['--tiny', '--out', out, '--configs', 'text2text'])
    assert rc == 0
    with open(os.path.join(out, 'parity_report.json')) as f:
        report = json.load(f)
    assert list(report['configs']) == ['text2text']
