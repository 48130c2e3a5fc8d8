// Shared bot plumbing for both game modes. Rebuilt from the behavior
// contract of the reference extension (bot/chrome_extension/scripts/
// duel.js + classic.js): capture screenshots through the service
// worker, rotate the in-game compass with synthetic mouse events, hide
// the GeoGuessr UI chrome while capturing, and talk to the pigeon_tpu
// model server (serve/server.py implements the other side).
//
// Improvement over the reference: the server URL is configurable via
// chrome.storage.local {serverUrl} instead of hardcoded.

const DEFAULT_SERVER = "http://127.0.0.1:5000";

async function serverUrl() {
  try {
    const stored = await chrome.storage.local.get("serverUrl");
    return stored.serverUrl || DEFAULT_SERVER;
  } catch (e) {
    return DEFAULT_SERVER;
  }
}

function wait(millis) {
  return new Promise((r) => setTimeout(r, millis));
}

function randomWait(minMs, maxMs) {
  return wait(Math.floor(Math.random() * (maxMs - minMs + 1) + minMs));
}

async function waitTillAppears(selector) {
  while (!document.querySelector(selector)) await wait(100);
}

async function waitTillDisappears(selector) {
  while (document.querySelector(selector)) await wait(100);
}

function sendToWorker(message) {
  return new Promise((resolve) => {
    chrome.runtime.sendMessage(message, (response) => resolve(response));
  });
}

const screenshot = () => sendToWorker({ action: "screenshot" });
const resizeWindow = () => sendToWorker({ action: "resizeWindow" });
const workerLog = (content) => sendToWorker({ action: "log", content });

function gameIdFromUrl() {
  const parts = window.location.href.split("/");
  return parts[parts.length - 1];
}

// --- UI hiding -----------------------------------------------------------

// Everything that would pollute the model's view of the panorama:
// street-view overlays (svg paths, Google chrome), the guess map, HUD,
// controls, chat. Selector prefixes track GeoGuessr's hashed class
// names the same way the reference did.
const HIDE_SELECTORS = [
  ".gmnoprint",
  ".gm-style-cc",
  ".gm-bundled-control",
  ".gm-control-active",
  ".gm-compass",
  '[class^="game-panorama_controls"]',
  '[class^="game_controls"]',
  '[class^="game_guess"]',
  '[class^="game-map"]',
  '[class^="game_hud"]',
  '[class^="chat-input"]',
  '[class^="chat-message"]',
  ".game-layout__guess-map",
  ".game-layout__controls",
  ".game-layout__status",
  ".game-layout__top-hud",
  ".guess-map__toggle",
  "#adconsent-usp-link",
];

function hideGUI(hide) {
  const display = hide ? "none" : "";
  for (const path of document.getElementsByTagName("path")) {
    path.style.display = display;
  }
  for (const selector of HIDE_SELECTORS) {
    for (const el of document.querySelectorAll(selector)) {
      try {
        el.style.display = display;
      } catch (e) {}
    }
  }
}

// --- Compass -------------------------------------------------------------

function simulateMouseEvent(element, eventName, x, y) {
  element.dispatchEvent(
    new MouseEvent(eventName, {
      view: window,
      bubbles: true,
      cancelable: true,
      clientX: x,
      clientY: y,
      button: 0,
    })
  );
}

// Clicking far outside the compass rose at a bearing snaps the view to
// that heading (GeoGuessr recenters toward the click azimuth). 0/90/
// 180/270 gives the 4-view panorama the PIGEON model was trained on.
async function changeHeading(degrees) {
  await waitTillAppears('[data-qa="compass"]');
  const compass = document.querySelector('[data-qa="compass"]');
  const box = compass.getBoundingClientRect();
  const angle = ((degrees - 90) / 180) * Math.PI;
  const x = (box.left + box.right) / 2 + 1000 * Math.cos(angle);
  const y = (box.top + box.bottom) / 2 + 1000 * Math.sin(angle);
  simulateMouseEvent(compass, "mousedown", x, y);
  simulateMouseEvent(compass, "mouseup", x, y);
  simulateMouseEvent(compass, "click", x, y);
}

// --- Capture + model server ---------------------------------------------

// 4 views at 0/90/180/270 deg, UI hidden during each capture.
async function capturePanorama() {
  const images = [];
  for (const heading of [0, 90, 180, 270]) {
    hideGUI(true);
    await changeHeading(heading);
    await wait(1250); // panorama re-render settle
    const response = await screenshot();
    images.push(response.image);
    hideGUI(false);
    await wait(250);
  }
  return images;
}

async function captureSingle() {
  hideGUI(true);
  await wait(500);
  const response = await screenshot();
  hideGUI(false);
  return response.image;
}

// POST /api/v1/predict — serve/server.py contract: `image` required,
// `image_2..4` optional (panorama), response {results: {lat, lng}, ...}.
async function requestPrediction(gameID, roundID, images) {
  const body = { gameID, roundID, image: images[0] };
  if (images.length === 4) {
    body.image_2 = images[1];
    body.image_3 = images[2];
    body.image_4 = images[3];
  }
  const resp = await fetch(`${await serverUrl()}/api/v1/predict`, {
    method: "POST",
    headers: { "Content-Type": "application/json" },
    body: JSON.stringify(body),
  });
  if (!resp.ok) {
    throw new Error(`predict failed: HTTP ${resp.status}`);
  }
  return resp.json();
}

// POST /api/v1/game — round-result logging for post-game analysis.
async function reportGameResult(gameID, roundID, game) {
  try {
    await fetch(`${await serverUrl()}/api/v1/game`, {
      method: "POST",
      headers: { "Content-Type": "application/json" },
      body: JSON.stringify({ gameID, roundID, game }),
    });
  } catch (e) {
    console.log("game report failed (non-fatal)", e);
  }
}
