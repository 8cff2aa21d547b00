"""CryoSPARC live-server mode with a mocked cryosparc-tools backend.

Reference: commands/cryosparc.py:78-96 (job-output load), lib/io.py:
2434-2497 (connect_cryosparc), plugins/cryosparc/extractparticles.py:
266-302+453 (external-job write-back pattern). The real package is not
installed here; a fake `cryosparc.tools` module drives the full
load -> plugin -> write-back path in-process.
"""

import argparse
import sys
import types
from unittest import mock

import numpy as np
import pytest

from helicon_tpu.utils.exceptions import HeliconError


def _particles_array(n=6):
    dt = [
        ("uid", "<u8"),
        ("blob/path", "S32"),
        ("location/micrograph_path", "S32"),
        ("mscope_params/exp_group_id", "<u4"),
    ]
    a = np.zeros(n, dt)
    a["uid"] = np.arange(n) + 1
    a["blob/path"] = [f"extract/p{i}.mrc".encode() for i in range(n)]
    a["location/micrograph_path"] = [
        f"mics/m{i % 2}.mrc".encode() for i in range(n)
    ]
    a["mscope_params/exp_group_id"] = (np.arange(n) % 3) + 1
    return a


class FakeJob:
    def __init__(self, uid, data):
        self.uid = uid
        self._data = data
        self.doc = dict(
            output_result_groups=[dict(name="particles", type="particle")],
            workspace_uids=["W1", "W7"],
        )

    def load_output(self, name):
        assert name == "particles"
        return self._data


class FakeExternalJob:
    def __init__(self):
        self.uid = "J99"
        self.connects = []
        self.outputs = []
        self.saved = {}
        self.started = False
        self.stopped = False

    def connect(self, **kw):
        self.connects.append(kw)

    def add_output(self, **kw):
        self.outputs.append(kw)

    def start(self, status="running"):
        self.started = True

    def save_output(self, name, dataset):
        self.saved[name] = dataset

    def stop(self):
        self.stopped = True


class FakeProject:
    def __init__(self):
        self.external_jobs = []

    def dir(self):
        return "/fake/project"

    def create_external_job(self, workspace, title="", desc=""):
        job = FakeExternalJob()
        job.workspace = workspace
        self.external_jobs.append(job)
        return job


class FakeCS:
    def __init__(self, jobs):
        self._jobs = jobs
        self.project = FakeProject()

    def find_project(self, pid):
        return self.project

    def find_job(self, pid, jid):
        return self._jobs[jid]


@pytest.fixture
def fake_cryosparc_tools(monkeypatch):
    """Install a fake cryosparc.tools so the import probe passes."""
    pkg = types.ModuleType("cryosparc")
    tools = types.ModuleType("cryosparc.tools")
    tools.CryoSPARC = mock.MagicMock()
    pkg.tools = tools
    monkeypatch.setitem(sys.modules, "cryosparc", pkg)
    monkeypatch.setitem(sys.modules, "cryosparc.tools", tools)
    return tools


def _args(**kw):
    ns = argparse.Namespace(
        csFile=[], output_csFile="", projectID="P1", jobID=["J1"],
        groupIndex=[0], outputWorkspaceID=None, saveLocal=0, verbose=0,
        cpu=-1, all_options=[], append_options=[],
    )
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


def test_server_mode_rejected_without_package():
    """Graceful reject only when cryosparc-tools is truly absent."""
    try:
        import cryosparc.tools  # noqa: F401

        pytest.skip("cryosparc-tools installed")
    except ImportError:
        pass
    from helicon_tpu.commands.cryosparc import main
    from helicon_tpu.utils.exceptions import HeliconDependencyError

    with pytest.raises(HeliconDependencyError, match="cryosparc-tools"):
        main(_args())


def test_full_load_plugin_writeback(fake_cryosparc_tools, monkeypatch):
    """load job output -> resetExposureGroups plugin -> external-job
    write-back, end to end on the mocked server."""
    import helicon_tpu.commands.cryosparc as cmd

    fake = FakeCS({"J1": FakeJob("J1", _particles_array())})
    monkeypatch.setattr(
        "helicon_tpu.io.metadata.connect_cryosparc", lambda *a, **k: fake
    )
    args = _args(
        all_options=["resetExposureGroups"], resetExposureGroups=1
    )
    cmd.main(args)
    # workspace inferred from the input job
    assert args.outputWorkspaceID == "W7"
    (job,) = fake.project.external_jobs
    assert job.workspace == "W7"
    assert job.started and job.stopped
    assert job.connects[0]["source_job_uid"] == "J1"
    assert job.connects[0]["target_input"] == "particles"
    assert job.outputs[0]["type"] == "particle"
    assert "mscope_params" in job.outputs[0]["slots"]
    saved = job.saved["helicon_output"]
    assert len(saved) == 6
    # the plugin reset every exposure group to 1
    assert set(np.asarray(saved["mscope_params/exp_group_id"]).tolist()) == {1}


def test_server_mode_save_local(fake_cryosparc_tools, monkeypatch, tmp_path):
    """--saveLocal writes a .cs file instead of uploading."""
    import helicon_tpu.commands.cryosparc as cmd
    from helicon_tpu.io.cs import read_cs

    fake = FakeCS({"J1": FakeJob("J1", _particles_array())})
    monkeypatch.setattr(
        "helicon_tpu.io.metadata.connect_cryosparc", lambda *a, **k: fake
    )
    monkeypatch.chdir(tmp_path)
    cmd.main(_args(saveLocal=1))
    assert not fake.project.external_jobs
    out = read_cs(tmp_path / "P1_J1.helicon.cs")
    assert len(out) == 6


def test_connect_cryosparc_reads_toml(fake_cryosparc_tools, tmp_path):
    from helicon_tpu.io.metadata import connect_cryosparc
    from helicon_tpu.utils.exceptions import HeliconConfigError

    cfg = tmp_path / "cryosparc.toml"
    with pytest.raises(HeliconConfigError, match="not found"):
        connect_cryosparc(str(cfg))
    cfg.write_text(
        'license = "abc"\nhost = "h"\nbase_port = 39000\n'
        'email = "e"\npassword = "p"\n'
    )
    cfg.chmod(0o644)
    with pytest.raises(HeliconConfigError, match="chmod 600"):
        connect_cryosparc(str(cfg))
    cfg.chmod(0o600)
    client = mock.MagicMock()
    client.test_connection.return_value = True
    fake_cryosparc_tools.CryoSPARC = mock.MagicMock(return_value=client)
    cs = connect_cryosparc(str(cfg))
    assert cs is client
    kwargs = fake_cryosparc_tools.CryoSPARC.call_args.kwargs
    assert kwargs == dict(
        license="abc", host="h", base_port=39000, email="e", password="p"
    )


def test_check_args_validation():
    from helicon_tpu.commands.cryosparc import add_args, check_args

    parser = argparse.ArgumentParser()
    add_args(parser)
    args = parser.parse_args(["--projectID", "P1", "--csFile", "a.cs"])
    with mock.patch("sys.argv", ["helicon", "cryosparc"]):
        with pytest.raises(HeliconError, match="not both"):
            check_args(args, parser)
        args = parser.parse_args([])
        with pytest.raises(HeliconError, match="specify server inputs"):
            check_args(args, parser)
        args = parser.parse_args(["--projectID", "P1", "--jobID", "J1", "J2"])
        args = check_args(args, parser)
        assert args.groupIndex == [0, 0]


def test_writeback_skips_jobs_without_output_groups(
    fake_cryosparc_tools, monkeypatch
):
    """A jobID whose job has no output groups is skipped during ingest;
    the write-back must connect only the ingested jobs (it used to
    IndexError on the skipped one after the pipeline had run)."""
    import helicon_tpu.commands.cryosparc as cmd

    empty = FakeJob("J0", None)
    empty.doc["output_result_groups"] = []
    fake = FakeCS({"J0": empty, "J1": FakeJob("J1", _particles_array())})
    monkeypatch.setattr(
        "helicon_tpu.io.metadata.connect_cryosparc", lambda *a, **k: fake
    )
    args = _args(
        jobID=["J0", "J1"], groupIndex=[0, 0],
        all_options=["resetExposureGroups"], resetExposureGroups=1,
    )
    cmd.main(args)
    (job,) = fake.project.external_jobs
    assert job.started and job.stopped
    assert [c["source_job_uid"] for c in job.connects] == ["J1"]
