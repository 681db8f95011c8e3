"""The first-egress shakedown script must stay runnable: its rehearse
mode replays the SAME check functions against the recorded fixtures
(VERDICT r4 item 9), so CI catches drift between the clients, the
fixtures, and the script's assertions."""

import json
import os
import subprocess
import sys


def test_net_smoke_rehearse_green():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(root, 'scripts', 'net_smoke.py'),
         '--rehearse'],
        capture_output=True, text=True, timeout=300,
        env={**os.environ, 'JAX_PLATFORMS': 'cpu'})
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = proc.stdout.strip().splitlines()[-1]
    out = json.loads(line)
    assert out['mode'] == 'rehearse'
    for check in ('threedep', 'uswtdb', 'hsds'):
        assert out[check]['status'] == 'ok', out[check]
