"""Multi-host pod plumbing: env-contract initialization, process-index in
lock bodies. Real pods need real hosts; these tests pin the contract."""

import json

import pytest

from birda_tpu.parallel import mesh


@pytest.fixture(autouse=True)
def _reset_flag():
    before = mesh._distributed_initialized
    yield
    mesh._distributed_initialized = before


class TestInitializeMultihost:
    def test_noop_without_env(self):
        assert mesh.initialize_multihost(env={}) is False
        assert mesh._distributed_initialized is False

    def test_env_contract_calls_jax_distributed(self, monkeypatch):
        calls = {}

        def fake_initialize(coordinator_address, num_processes, process_id):
            calls.update(addr=coordinator_address, n=num_processes,
                         pid=process_id)

        import jax

        monkeypatch.setattr(jax.distributed, "initialize", fake_initialize)
        env = {
            mesh.ENV_COORDINATOR: "10.0.0.1:8476",
            mesh.ENV_NUM_PROCESSES: "4",
            mesh.ENV_PROCESS_ID: "2",
        }
        assert mesh.initialize_multihost(env=env) is True
        assert calls == {"addr": "10.0.0.1:8476", "n": 4, "pid": 2}
        # Idempotent: second call joins nothing twice.
        calls.clear()
        assert mesh.initialize_multihost(env=env) is True
        assert calls == {}

    def test_missing_rank_is_a_typed_error(self):
        from birda_tpu.errors import ConfigValidation

        with pytest.raises(ConfigValidation, match="BIRDA_NUM_PROCESSES"):
            mesh.initialize_multihost(
                env={mesh.ENV_COORDINATOR: "10.0.0.1:8476"}
            )


class TestProcessIndexInLocks:
    def test_single_host_rank_zero_without_backend_touch(self):
        assert mesh.process_index() == 0

    def test_lock_body_records_process_index(self, tmp_path):
        from birda_tpu.locking.file_lock import FileLock

        lock = FileLock.acquire(tmp_path / "a.wav", tmp_path)
        try:
            body = json.loads(lock.lock_path.read_text())
            assert body["process_index"] == 0
            assert "pid" in body and "hostname" in body
        finally:
            lock.release()
