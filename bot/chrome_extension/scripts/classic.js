// Classic (single-player) game bot. The reference's classic.js only
// captured and displayed a screenshot — it never actually guessed
// (bot/chrome_extension/scripts/classic.js:1-17). This version
// completes the mode: single screenshot -> model server -> submit the
// guess through the public v3 game API, then report the result.
//
// Classic rounds show ONE street-view image, so start the model server
// WITHOUT --panorama (single-image tower).

(async () => {
  // All 5 rounds share the same /game/<token> URL — track rounds by
  // counting guess-button cycles, not by token. The counter is
  // persisted per game token so the reload fallback below does not
  // reset it to 1 mid-game.
  const roundKey = `pigeonRound:${gameIdFromUrl()}`;
  let roundNumber = parseInt(sessionStorage.getItem(roundKey) || "1", 10);

  while (true) {
    await waitTillAppears(".guess-map__guess-button");
    await randomWait(1500, 5000);

    const gameToken = gameIdFromUrl();
    const image = await captureSingle();

    let guess;
    try {
      guess = await requestPrediction(gameToken, roundNumber, [image]);
    } catch (e) {
      console.log("prediction failed", e);
      await wait(2000);
      continue;
    }
    console.log("pigeon_tpu guess", guess.results);

    const result = await submitClassicGuess(
      gameToken,
      guess.results.lat,
      guess.results.lng
    );
    await reportGameResult(gameToken, result.round || roundNumber, result);
    roundNumber += 1;
    sessionStorage.setItem(roundKey, String(roundNumber));
    // Round transition: the guess button goes away with the result
    // screen, then reappears for the next round. An API-submitted guess
    // may not update the SPA's UI state, so the wait is bounded: if the
    // button is still there after 15 s, reload — the server already has
    // the guess, and a fresh page lands on the next round's view.
    const gone = await waitTillDisappearsOrTimeout(
      ".guess-map__guess-button", 15000);
    if (!gone) {
      console.log("UI did not advance after API guess; reloading");
      location.reload();
      return; // content script re-injects on reload
    }
  }
})();

async function waitTillDisappearsOrTimeout(selector, timeoutMs) {
  const deadline = Date.now() + timeoutMs;
  while (document.querySelector(selector)) {
    if (Date.now() > deadline) return false;
    await wait(100);
  }
  return true;
}

async function submitClassicGuess(token, lat, lng) {
  try {
    const resp = await fetch(
      `https://www.geoguessr.com/api/v3/games/${token}`,
      {
        method: "POST",
        credentials: "include",
        headers: { "Content-Type": "application/json", "x-client": "web" },
        body: JSON.stringify({ token, lat, lng, timedOut: false }),
      }
    );
    return await resp.json().catch(() => ({}));
  } catch (e) {
    console.log("guess submit failed", e);
    return {};
  }
}
