// Service worker: privileged operations the content scripts cannot do
// themselves. Rebuilt MV3 counterpart of the reference bot's worker
// (reference bot/chrome_extension/scripts/background.js:1-20): tab
// screenshots, window resize to the model's expected aspect, and log
// relay. Screenshot capture uses chrome.tabs.captureVisibleTab — no
// html2canvas dependency.

const PANORAMA_WINDOW = { width: 921, height: 1000 };

chrome.runtime.onMessage.addListener((request, sender, sendResponse) => {
  if (!request || !request.action) return false;

  switch (request.action) {
    case "resizeWindow":
      // Resize the window the REQUESTING tab lives in — getCurrent in a
      // service worker is the last-focused window, which may differ.
      if (sender.tab && sender.tab.windowId !== undefined) {
        chrome.windows.update(
          sender.tab.windowId,
          { ...PANORAMA_WINDOW, state: "normal" },
          () => sendResponse({ ok: true })
        );
      } else {
        chrome.windows.getCurrent((win) => {
          chrome.windows.update(win.id, {
            ...PANORAMA_WINDOW,
            state: "normal",
          });
          sendResponse({ ok: true });
        });
      }
      return true;

    case "screenshot":
      // JPEG (not the default PNG): the server re-encodes to 336px
      // anyway and JPEG cuts the localhost POST body ~5x. Capture the
      // sender's window, not whichever window is focused.
      chrome.tabs.captureVisibleTab(
        sender.tab ? sender.tab.windowId : null,
        { format: "jpeg", quality: 90 },
        (dataUri) => sendResponse({ image: dataUri })
      );
      return true;

    case "log":
      console.log(request.content);
      sendResponse({ ok: true });
      return false;

    default:
      return false;
  }
});

// Custom model servers: host_permissions cover geoguessr + localhost
// only; a non-default {serverUrl} origin needs a runtime grant from
// optional_host_permissions. Content scripts cannot call
// chrome.permissions, and request() needs a user gesture — a toolbar
// click is one, and it reaches the service worker.
chrome.action.onClicked.addListener(async () => {
  try {
    const stored = await chrome.storage.local.get("serverUrl");
    if (!stored.serverUrl) return;
    const origin = new URL(stored.serverUrl).origin + "/*";
    const has = await chrome.permissions.contains({ origins: [origin] });
    if (!has) {
      const granted = await chrome.permissions.request({
        origins: [origin],
      });
      console.log("model-server permission " + origin + ": " + granted);
    }
  } catch (e) {
    console.log("model-server permission request failed: " + e);
  }
});
