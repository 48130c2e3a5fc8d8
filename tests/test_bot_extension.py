"""Contract tests keeping bot/chrome_extension in sync with serve/.

The reference shipped the extension but not the server
(`/root/reference/bot/chrome_extension/`, bot/README.md:3); this repo
ships both sides. These tests pin the shared contract so neither side
drifts: the JSON keys the content scripts send are exactly the keys
`serve/server.py` parses, and every file the manifest references exists.
"""

import json
import re
from pathlib import Path

import pytest

EXT = Path(__file__).resolve().parent.parent / "bot" / "chrome_extension"
SERVER = (Path(__file__).resolve().parent.parent
          / "pigeon_tpu" / "serve" / "server.py")


@pytest.fixture(scope="module")
def manifest():
    return json.loads((EXT / "manifest.json").read_text())


def script_text(name: str) -> str:
    return (EXT / "scripts" / name).read_text()


def test_manifest_is_mv3_and_scripts_exist(manifest):
    assert manifest["manifest_version"] == 3
    referenced = [manifest["background"]["service_worker"]]
    for entry in manifest["content_scripts"]:
        referenced.extend(entry["js"])
        assert entry["matches"], "content script with no URL match"
    for rel in referenced:
        assert (EXT / rel).is_file(), f"manifest references missing {rel}"


def test_game_mode_coverage(manifest):
    """Duels, team duels, battle royale, and classic are all wired
    (reference manifest.json:18-38)."""
    matches = [m for e in manifest["content_scripts"] for m in e["matches"]]
    for mode in ("game", "duels", "team-duels", "battle-royale"):
        assert any(f"/{mode}/" in m for m in matches), mode


def test_predict_payload_keys_match_server():
    """The keys common.js sends are the keys PredictionService reads."""
    common = script_text("common.js")
    server = SERVER.read_text()
    for key in ("gameID", "roundID", "image", "image_2", "image_3",
                "image_4"):
        assert re.search(rf"\b{key}\b", common), f"extension drops {key}"
        assert re.search(rf"\b{key}\b", server), f"server ignores {key}"


def test_endpoints_match_server():
    common = script_text("common.js")
    server = SERVER.read_text()
    for endpoint in ("/api/v1/predict", "/api/v1/game"):
        assert endpoint in common
        assert endpoint in server


def test_response_field_consumed_exists():
    """Content scripts read guess.results.lat/lng — the server returns
    {"results": {"lat": .., "lng": ..}} (serve/server.py:105)."""
    duel = script_text("duel.js")
    classic = script_text("classic.js")
    assert "guess.results.lat" in duel and "guess.results.lng" in duel
    assert "guess.results.lat" in classic and "guess.results.lng" in classic


def test_panorama_headings():
    """4 views at 0/90/180/270 degrees — the panorama layout the model
    was trained on (reference duel.js:18-47, data/image_ops.py
    heading_to_sincos)."""
    common = script_text("common.js")
    assert re.search(r"\[0,\s*90,\s*180,\s*270\]", common)


def test_worker_actions_handled():
    """Every action a content script sends has a worker handler."""
    background = script_text("background.js")
    common = script_text("common.js")
    sent = set(re.findall(r'action:\s*"(\w+)"', common))
    handled = set(re.findall(r'case "(\w+)"', background))
    assert sent, "no worker messages found in common.js"
    assert sent <= handled, f"unhandled worker actions: {sent - handled}"


def test_optional_host_permission_is_reachable(manifest):
    """optional_host_permissions must be backed by a request flow: the
    toolbar-click handler grants a custom {serverUrl} origin (content
    scripts cannot call chrome.permissions; request() needs a gesture)."""
    assert "optional_host_permissions" in manifest
    assert "action" in manifest  # toolbar button = the user gesture
    background = script_text("background.js")
    assert "chrome.action.onClicked" in background
    assert "chrome.permissions.request" in background
