"""Web UI smoke tests: PNG codec, slice rendering, live server endpoints."""

import json
import threading
import urllib.request
import zlib

import numpy as np
import pytest

from unet_studio_tpu.ui.png import encode_png, render_slice


class TestPng:
    def test_grayscale_png_valid(self, rng):
        img = (rng.random((20, 30)) * 255).astype(np.uint8)
        data = encode_png(img)
        assert data[:8] == b"\x89PNG\r\n\x1a\n"
        # decode IDAT and verify scanlines
        idat_at = data.find(b"IDAT")
        length = int.from_bytes(data[idat_at - 4 : idat_at], "big")
        raw = zlib.decompress(data[idat_at + 4 : idat_at + 4 + length])
        assert len(raw) == 20 * (30 + 1)
        rows = np.frombuffer(raw, np.uint8).reshape(20, 31)
        assert (rows[:, 0] == 0).all()  # filter byte
        np.testing.assert_array_equal(rows[:, 1:], img)

    def test_rgb_and_overlay(self, rng):
        img = rng.random((16, 16)).astype(np.float32)
        lab = np.zeros((16, 16), np.int32)
        lab[4:8, 4:8] = 1
        png = render_slice(img, lab)
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        with pytest.raises(ValueError):
            encode_png(np.zeros((4, 4, 2), np.uint8))


class TestServer:
    @pytest.fixture(scope="class")
    def server_url(self, tmp_path_factory):
        import os

        from http.server import ThreadingHTTPServer

        from unet_studio_tpu.ui.server import AppState, make_handler

        # persisted settings go to a throwaway file, not ~/.config
        os.environ["UNET_TPU_SETTINGS"] = str(
            tmp_path_factory.mktemp("cfg") / "settings.json"
        )
        state = AppState()
        srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(state))
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        yield f"http://127.0.0.1:{srv.server_address[1]}"
        srv.shutdown()
        del os.environ["UNET_TPU_SETTINGS"]

    def test_index(self, server_url):
        html = urllib.request.urlopen(server_url + "/").read().decode()
        assert "UNet Studio" in html and "Evaluate" in html

    def test_assets(self, server_url):
        j = json.loads(urllib.request.urlopen(server_url + "/api/assets").read())
        assert "zoo" in j and "templates" in j

    def test_console_endpoint(self, server_url):
        j = json.loads(urllib.request.urlopen(server_url + "/api/console").read())
        assert "lines" in j

    def test_eval_flow(self, server_url, tmp_path, rng):
        from unet_studio_tpu.io.nifti import write_nifti
        from unet_studio_tpu.models.serialize import save_model
        from unet_studio_tpu.models.unet3d import UNet3d

        arch = "\n".join(
            [
                "conv8,ks3,stride1+norm,leaky_relu",
                "conv16,ks3,stride2+norm,leaky_relu",
                "conv16,ks3,stride2+norm,leaky_relu+conv_trans16,ks2,stride2",
                "conv16,ks3,stride1+norm,leaky_relu+conv3,ks1,stride1+conv_trans8,ks2,stride2",
                "conv8,ks3,stride1+norm,leaky_relu+conv3,ks1,stride1",
            ]
        )
        m = UNet3d.create(1, 3, arch, seed=0)
        m.dim = (16, 16, 16)
        mp = str(tmp_path / "m.nz")
        save_model(mp, m, sloped=False)
        src = str(tmp_path / "img.nii.gz")
        write_nifti(src, rng.random((16, 16, 16)).astype(np.float32))

        def post(path, body):
            req = urllib.request.Request(
                server_url + path, data=json.dumps(body).encode(), method="POST"
            )
            return json.loads(urllib.request.urlopen(req).read())

        j = post("/api/model/load", {"path": mp})
        assert j["out_count"] == 3
        j = post("/api/eval/run", {"source": src})
        assert j["dims"] == [16, 16, 16]
        png = urllib.request.urlopen(
            server_url + "/api/eval/slice?axis=0&index=8&overlay=1&view=input"
        ).read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        out = str(tmp_path / "out.nii.gz")
        j = post("/api/eval/save", {"path": out, "output_type": 0})
        assert j["saved"] == out

    def test_options_endpoint(self, server_url):
        j = json.loads(urllib.request.urlopen(server_url + "/api/options").read())
        ids = {o["id"] for o in j["options"]}
        assert {"cropping", "noise_mag", "rotation_x"} <= ids
        pp = {o["id"] for o in j["postproc"] if o["kind"] == "button"}
        assert "defragment_each" in pp and "gaussian_smoothing" in pp

    def test_postproc_action_and_contrast(self, server_url, tmp_path, rng):
        # runs after test_eval_flow in class order: a case is loaded
        def post(path, body):
            req = urllib.request.Request(
                server_url + path, data=json.dumps(body).encode(), method="POST"
            )
            return json.loads(urllib.request.urlopen(req).read())

        j = post("/api/eval/action", {"cmd": "gaussian_smoothing"})
        assert j["ok"]
        j = post("/api/eval/action", {"cmd": "binarize", "param1": 0.5})
        assert j["ok"]
        png = urllib.request.urlopen(
            server_url
            + "/api/eval/slice?axis=0&index=8&view=input&vmin=0.2&vmax=0.8"
        ).read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"

    def test_every_rendered_postproc_button_returns_200(self, server_url):
        """Every button the option tree renders must be accepted —
        including summed-probability defragment and anisotropic smoothing
        (postproc.txt:1-14); unknown commands log and continue
        (evaluate.cpp:372), never 500."""

        def post(path, body):
            req = urllib.request.Request(
                server_url + path, data=json.dumps(body).encode(), method="POST"
            )
            return json.loads(urllib.request.urlopen(req).read())

        j = json.loads(urllib.request.urlopen(server_url + "/api/options").read())
        buttons = [o["id"] for o in j["postproc"] if o["kind"] == "button"]
        assert "defragment" in buttons and "anisotropic_smoothing" in buttons
        for cmd in buttons:
            r = post(
                "/api/eval/action", {"cmd": cmd, "param1": 0.5, "param2": 1.0}
            )
            assert r.get("ok"), (cmd, r)
        # unknown command: logged, not an error (evaluate.cpp:372)
        r = post("/api/eval/action", {"cmd": "no_such_command"})
        assert r.get("ok"), r

    def test_cross_origin_post_rejected(self, server_url):
        """State-changing POSTs from a foreign web origin are refused
        (drive-by CSRF guard); localhost origins pass."""
        body = json.dumps({"cmd": "argmax"}).encode()
        req = urllib.request.Request(
            server_url + "/api/eval/action", data=body, method="POST",
            headers={"Origin": "http://evil.example"},
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req)
        assert exc.value.code == 403
        req = urllib.request.Request(
            server_url + "/api/eval/action", data=body, method="POST",
            headers={"Origin": server_url},
        )
        j = json.loads(urllib.request.urlopen(req).read())
        assert j.get("ok")

    def test_batch_evaluate_and_save_all(self, server_url, tmp_path, rng):
        """The reference evaluates a checked LIST of volumes and batch-
        saves with rename-by-example (mainwindow_evaluation.cpp:292-337,
        384-410): N sources in one request, case switching, save_all
        deriving every other output name from the current case's."""
        from unet_studio_tpu.io.nifti import write_nifti

        def post(path, body):
            req = urllib.request.Request(
                server_url + path, data=json.dumps(body).encode(), method="POST"
            )
            return json.loads(urllib.request.urlopen(req).read())

        srcs = []
        for name in ("sub-01_T1w", "sub-02_T1w", "sub-03_T1w"):
            p = str(tmp_path / f"{name}.nii.gz")
            write_nifti(p, rng.random((16, 16, 16)).astype(np.float32))
            srcs.append(p)
        j = post("/api/eval/run", {"sources": srcs})
        assert len(j["cases"]) == 3 and j["current"] == 0
        assert all(not c["error"] for c in j["cases"])
        j2 = post("/api/eval/select", {"index": 2})
        assert j2["path"] == srcs[2] and j2["dims"] == [16, 16, 16]
        post("/api/eval/select", {"index": 0})
        out = str(tmp_path / "sub-01_mask.nii.gz")
        j3 = post("/api/eval/save_all", {"path": out, "output_type": 0})
        assert j3["errors"] == []
        assert sorted(j3["saved"]) == sorted(
            str(tmp_path / f"sub-{i:02d}_mask.nii.gz") for i in (1, 2, 3)
        )
        import os

        for p in j3["saved"]:
            assert os.path.exists(p)

    def test_new_network_and_census(self, server_url, tmp_path, rng):
        from unet_studio_tpu.io.nifti import write_nifti

        d = tmp_path / "bids"
        d.mkdir()
        img = rng.random((12, 12, 12)).astype(np.float32)
        lab = (rng.random((12, 12, 12)) * 3).astype(np.int16)
        write_nifti(str(d / "tpl-A_T1w.nii.gz"), img, is_mni=True)
        write_nifti(str(d / "tpl-A_dseg.nii.gz"), lab, is_mni=True)

        def post(path, body):
            req = urllib.request.Request(
                server_url + path, data=json.dumps(body).encode(), method="POST"
            )
            return json.loads(urllib.request.urlopen(req).read())

        j = json.loads(
            urllib.request.urlopen(
                server_url + "/api/train/label_census?bids=" + str(d)
            ).read()
        )
        assert j["max_label"] == int(lab.max())
        assert j["pairs"][0]["template"] is True

        mp = str(tmp_path / "nn.nz")
        j = post(
            "/api/train/new_network",
            {"model": mp, "in_count": 1, "out_count": j["suggested_out_count"]},
        )
        assert j["out_count"] == int(lab.max()) + 1
        import os

        assert os.path.exists(mp)

    def test_reorder_channels(self, server_url, tmp_path):
        def post(path, body):
            req = urllib.request.Request(
                server_url + path, data=json.dumps(body).encode(), method="POST"
            )
            return json.loads(urllib.request.urlopen(req).read())

        # model with out_count 3 is loaded from test_eval_flow
        j = post("/api/model/reorder", {"order": [0, 2, 1]})
        assert j["out_count"] == 3

    def test_pause_without_engine_errors(self, server_url):
        req = urllib.request.Request(
            server_url + "/api/train/pause", data=b"{}", method="POST"
        )
        try:
            urllib.request.urlopen(req)
            raise AssertionError("expected 500")
        except urllib.error.HTTPError as e:
            assert e.code == 500

    def test_console_run(self, server_url):
        import time

        def post(path, body):
            req = urllib.request.Request(
                server_url + path, data=json.dumps(body).encode(), method="POST"
            )
            return json.loads(urllib.request.urlopen(req).read())

        j = post("/api/console/run", {"cmd": "--action evaluate"})
        assert "started" in j
        # the CLI errors (no model) into the console ring
        for _ in range(40):
            lines = json.loads(
                urllib.request.urlopen(server_url + "/api/console").read()
            )["lines"]
            if any("exited with code" in ln for ln in lines):
                break
            time.sleep(0.25)
        assert any("exited with code" in ln for ln in lines)

    def test_four_output_views_and_prob_channels(self, server_url):
        """The evaluate tab's 4 output views (label overlay / skull-strip /
        mask / per-channel probability, mainwindow_evaluation.cpp:292-352)
        must all render; unknown views are a 500, not a silent fg view."""
        for view in ("input", "skull_strip", "mask", "fg"):
            png = urllib.request.urlopen(
                server_url + f"/api/eval/slice?axis=0&index=8&view={view}"
            ).read()
            assert png[:8] == b"\x89PNG\r\n\x1a\n", view
        for ch in (0, 1, 2):
            png = urllib.request.urlopen(
                server_url
                + f"/api/eval/slice?axis=0&index=8&view=prob&channel={ch}"
            ).read()
            assert png[:8] == b"\x89PNG\r\n\x1a\n", ch
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(
                server_url + "/api/eval/slice?axis=0&index=8&view=bogus"
            )
        assert exc.value.code == 500

    def test_settings_persistence(self, server_url):
        """QSettings analog: option overrides persist and are merged into
        /api/options defaults; model loads record MRU + last network."""
        import os

        def post(path, body):
            req = urllib.request.Request(
                server_url + path, data=json.dumps(body).encode(), method="POST"
            )
            return json.loads(urllib.request.urlopen(req).read())

        j = post("/api/settings", {"options": {"noise_mag": 0.35}})
        assert j["option_overrides"]["noise_mag"] == 0.35
        # merged into the rendered option tree
        opts = json.loads(urllib.request.urlopen(server_url + "/api/options").read())
        noise = next(o for o in opts["options"] if o["id"] == "noise_mag")
        assert noise["default"] == 0.35
        # persisted to disk
        with open(os.environ["UNET_TPU_SETTINGS"]) as f:
            disk = json.load(f)
        assert disk["option_overrides"]["noise_mag"] == 0.35
        # model load earlier in the class recorded MRU + last_network
        st = json.loads(urllib.request.urlopen(server_url + "/api/settings").read())
        assert st["last_network"].endswith("m.nz")
        assert st["mru_model_dirs"] and st["mru_source_dirs"]
        # removing an override restores the table default
        post("/api/settings", {"options": {"noise_mag": None}})
        opts = json.loads(urllib.request.urlopen(server_url + "/api/options").read())
        noise = next(o for o in opts["options"] if o["id"] == "noise_mag")
        assert noise["default"] != 0.35


def test_chart_decimation_keeps_full_history():
    """10000-epoch histories are decimated (first+last kept, epochs
    reported), never truncated to the tail (mainwindow_training.cpp:405-510
    plots everything)."""
    from unet_studio_tpu.ui.server import AppState

    errors = [float(i) for i in range(3 * 10000)]
    flat, epochs = AppState._decimate_errors(errors, max_epochs=1000)
    assert len(epochs) <= 1000
    assert epochs[0] == 0 and epochs[-1] == 9999
    assert flat[:3] == [0.0, 1.0, 2.0]
    assert flat[-3:] == [29997.0, 29998.0, 29999.0]
    # short histories pass through untouched
    flat2, epochs2 = AppState._decimate_errors(errors[:30], max_epochs=1000)
    assert flat2 == errors[:30] and epochs2 == list(range(10))
