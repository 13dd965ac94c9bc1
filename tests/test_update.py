"""Self-update tests (reference ``src/update/`` behaviors)."""

import hashlib
import io
import tarfile

import pytest

from birda_tpu.errors import (
    UpdateChecksumMismatch,
    UpdateDevBuild,
    UpdateFetchFailed,
    UpdateManifestParse,
    UpdateUnsupportedPlatform,
)
from birda_tpu.update import (
    UpdateInfo,
    check_for_update,
    is_dev_build,
    parse_semver,
    platform_asset_key,
    replace_binary,
)
from birda_tpu.update.mod import perform_update


class _FakeResp:
    def __init__(self, json_data=None, content=b"", text="", status=200):
        self._json = json_data
        self.content = content
        self.text = text
        self.status_code = status

    def raise_for_status(self):
        if self.status_code != 200:
            raise IOError(f"http {self.status_code}")

    def json(self):
        return self._json


class _FakeSession:
    def __init__(self, responses):
        self.responses = responses  # url-substring -> _FakeResp

    def get(self, url, **kw):
        for key, resp in self.responses.items():
            if key in url:
                return resp
        return _FakeResp(status=404)


class TestSemver:
    def test_parse(self):
        assert parse_semver("1.2.3") == (1, 2, 3)
        assert parse_semver("v10.0.1") == (10, 0, 1)
        with pytest.raises(UpdateManifestParse):
            parse_semver("main")

    def test_ordering(self):
        assert parse_semver("1.10.0") > parse_semver("1.9.9")


class TestPlatformKey:
    def test_linux(self):
        key = platform_asset_key()
        assert key.startswith("birda-")
        assert "linux" in key or "macos" in key or "windows" in key


class TestCheckForUpdate:
    def manifest(self, tag, assets):
        return {"tag_name": tag, "assets": assets}

    def test_up_to_date(self):
        sess = _FakeSession({
            "releases/latest": _FakeResp(self.manifest("v0.0.1", [])),
        })
        assert check_for_update(session=sess, current="1.0.0") is None

    def test_newer_with_asset(self):
        key = platform_asset_key()
        sess = _FakeSession({
            "releases/latest": _FakeResp(self.manifest("v2.0.0", [
                {"name": f"{key}.tar.gz",
                 "browser_download_url": "https://dl/x.tar.gz"},
            ])),
        })
        info = check_for_update(session=sess, current="1.0.0")
        assert info.version == "v2.0.0"
        assert info.asset_name == f"{key}.tar.gz"

    def test_newer_without_platform_asset(self):
        sess = _FakeSession({
            "releases/latest": _FakeResp(self.manifest("v2.0.0", [
                {"name": "birda-solaris-sparc.tar.gz",
                 "browser_download_url": "https://dl/x"},
            ])),
        })
        with pytest.raises(UpdateUnsupportedPlatform):
            check_for_update(session=sess, current="1.0.0")

    def test_fetch_failure(self):
        sess = _FakeSession({})
        with pytest.raises(UpdateFetchFailed):
            check_for_update(session=sess, current="1.0.0")


class TestPerformUpdate:
    def make_archive(self, binary_content=b"#!/bin/sh\necho new\n"):
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w:gz") as tf:
            info = tarfile.TarInfo("birda")
            info.size = len(binary_content)
            tf.addfile(info, io.BytesIO(binary_content))
        return buf.getvalue()

    def test_dev_build_refuses(self, tmp_path, monkeypatch):
        # Package version is 0.x -> dev guard trips.
        info = UpdateInfo("v9.9.9", "https://dl/a.tar.gz", "a.tar.gz")
        with pytest.raises(UpdateDevBuild):
            perform_update(info, session=_FakeSession({}))

    def test_full_swap(self, tmp_path, monkeypatch):
        import birda_tpu.update.mod as upd

        monkeypatch.setattr(upd, "is_dev_build", lambda *a: False)
        payload = self.make_archive()
        sha = hashlib.sha256(payload).hexdigest()
        key = platform_asset_key()
        sess = _FakeSession({
            "dl/": _FakeResp(content=payload),
        })
        target = tmp_path / "birda"
        target.write_bytes(b"old binary")
        target.chmod(0o755)
        info = UpdateInfo("v9.9.9", "https://dl/a.tar.gz",
                          f"{key}.tar.gz", sha256=sha)
        out = perform_update(info, session=sess, target=target)
        assert out == target
        assert b"echo new" in target.read_bytes()
        assert (tmp_path / "birda.backup").read_bytes() == b"old binary"

    def test_decoy_sidecar_not_installed(self, tmp_path, monkeypatch):
        """An archive whose first-sorting member is ``birda-runtime.json``
        must still install the actual binary — extraction matches exact
        binary names, not a ``birda*`` prefix (reference replace.rs:97)."""
        import birda_tpu.update.mod as upd

        monkeypatch.setattr(upd, "is_dev_build", lambda *a: False)
        key = platform_asset_key()
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w:gz") as tf:
            decoy = b'{"jax": "9.9"}'
            info = tarfile.TarInfo("birda-runtime.json")
            info.size = len(decoy)
            tf.addfile(info, io.BytesIO(decoy))
            binary = b"#!/bin/sh\necho real\n"
            info = tarfile.TarInfo(key)
            info.size = len(binary)
            tf.addfile(info, io.BytesIO(binary))
        payload = buf.getvalue()
        sess = _FakeSession({"dl/": _FakeResp(content=payload)})
        target = tmp_path / "birda"
        target.write_bytes(b"old")
        target.chmod(0o755)
        info = UpdateInfo("v9.9.9", "https://dl/a.tar.gz", f"{key}.tar.gz",
                          sha256=hashlib.sha256(payload).hexdigest())
        perform_update(info, session=sess, target=target)
        assert b"echo real" in target.read_bytes()

    def test_binary_only_decoys_raises(self, tmp_path, monkeypatch):
        """All-decoy archive (no exact binary name) is a typed failure."""
        import birda_tpu.update.mod as upd
        from birda_tpu.errors import UpdateExtractFailed
        from birda_tpu.update.mod import _extract_binary

        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w:gz") as tf:
            decoy = b"{}"
            info = tarfile.TarInfo("birda-runtime.json")
            info.size = len(decoy)
            tf.addfile(info, io.BytesIO(decoy))
        archive = tmp_path / "a.tar.gz"
        archive.write_bytes(buf.getvalue())
        with pytest.raises(UpdateExtractFailed):
            _extract_binary(archive, tmp_path)

    def test_checksum_mismatch(self, tmp_path, monkeypatch):
        import birda_tpu.update.mod as upd

        monkeypatch.setattr(upd, "is_dev_build", lambda *a: False)
        sess = _FakeSession({"dl/": _FakeResp(content=b"evil")})
        target = tmp_path / "birda"
        target.write_bytes(b"old")
        info = UpdateInfo("v9.9.9", "https://dl/a.tar.gz", "a.tar.gz",
                          sha256="0" * 64)
        with pytest.raises(UpdateChecksumMismatch):
            perform_update(info, session=sess, target=target)
        assert target.read_bytes() == b"old"


class TestReplaceBinary:
    def test_mode_preserved(self, tmp_path):
        target = tmp_path / "birda"
        target.write_bytes(b"old")
        target.chmod(0o755)
        new = tmp_path / "new"
        new.write_bytes(b"new!")
        replace_binary(target, new)
        import stat

        assert target.read_bytes() == b"new!"
        assert stat.S_IMODE(target.stat().st_mode) == 0o755


class TestLibraryVersionWarnings:
    """Runtime-compat warnings before a swap (reference mod.rs:242-256
    warns on CUDA toolkit/cuDNN drift; ours compares jax/libtpu)."""

    def test_runtime_sidecar_parsed(self):
        from birda_tpu.update.mod import check_for_update, platform_asset_key

        key = platform_asset_key()
        sess = _FakeSession({
            "releases/latest": _FakeResp({"tag_name": "v2.0.0", "assets": [
                {"name": f"{key}.tar.gz",
                 "browser_download_url": "https://dl/x.tar.gz"},
                {"name": "birda-runtime.json",
                 "browser_download_url": "https://dl/runtime.json"},
            ]}),
            "runtime.json": _FakeResp(text='{"jax": "99.0.0"}'),
        })
        info = check_for_update(session=sess, current="1.0.0")
        assert info.runtime == {"jax": "99.0.0"}

    def test_mismatch_warns_match_is_silent(self):
        import jax

        from birda_tpu.update.mod import UpdateInfo, check_library_versions

        mismatched = UpdateInfo("v2.0.0", "u", "a",
                                runtime={"jax": "99.0.0"})
        ws = check_library_versions(mismatched)
        assert len(ws) == 1 and "99.0.0" in ws[0] and jax.__version__ in ws[0]

        matched = UpdateInfo("v2.0.0", "u", "a",
                             runtime={"jax": jax.__version__})
        assert check_library_versions(matched) == []
        # No sidecar, absent library: nothing to say.
        assert check_library_versions(UpdateInfo("v", "u", "a")) == []
        assert check_library_versions(
            UpdateInfo("v", "u", "a", runtime={"libnotreal": "1.0"})) == []
