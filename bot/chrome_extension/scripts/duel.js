// Duels / team-duels / battle-royale bot loop. Rebuilt from the
// reference round loop's behavior (bot/chrome_extension/scripts/
// duel.js:13-101): wait for the guess UI, capture a 4-view panorama,
// ask the model server, submit the guess to the GeoGuessr game-server
// API with round-number resync on HTTP 400, report the round result
// back to the model server, then wait for the next round.
//
// Requires the model server started in panorama mode:
//   python -m pigeon_tpu.cli.run serve RUN --panorama --port 5000

(async () => {
  await resizeWindow(); // model-friendly aspect (921x1000)

  let roundNumber = 1;
  const battleRoyale = window.location.href.includes("battle-royale");
  const guessButton = battleRoyale
    ? '[class^="game_guess"]'
    : ".guess-map__guess-button";

  while (true) {
    await waitTillAppears(guessButton);
    await randomWait(2000, 9000); // humanize round pacing

    const gameID = gameIdFromUrl();
    const images = await capturePanorama();

    let guess;
    try {
      guess = await requestPrediction(gameID, roundNumber, images);
    } catch (e) {
      console.log("prediction failed, skipping round", e);
      await waitTillDisappears(guessButton);
      continue;
    }
    console.log("pigeon_tpu guess", guess.results);

    // The duel API rejects a stale round number with HTTP 400 and
    // reports the current one — resync to THAT number and retry (with
    // backoff: a malformed 400 body must not become a tight loop).
    let result;
    let submitted = roundNumber;
    for (let attempt = 0; attempt < 5; attempt++) {
      result = await submitDuelGuess(
        gameID,
        guess.results.lat,
        guess.results.lng,
        submitted,
        battleRoyale
      );
      if (result.resp.status !== 400) break;
      submitted = result.body.currentRoundNumber || submitted + 1;
      await wait(500);
    }
    roundNumber = submitted + 1;

    await reportGameResult(gameID, submitted, result.body);
    await waitTillDisappears(guessButton);
  }
})();

async function submitDuelGuess(gameID, lat, lng, roundNumber, battleRoyale) {
  const mode = battleRoyale ? "battle-royale" : "duels";
  const apiURL = `https://game-server.geoguessr.com/api/${mode}/${gameID}/guess`;
  try {
    const resp = await fetch(apiURL, {
      method: "POST",
      credentials: "include",
      headers: { "Content-Type": "application/json", "x-client": "web" },
      body: JSON.stringify({ lat, lng, roundNumber }),
    });
    // Non-JSON error pages (proxy 502s) must not kill the round loop.
    const body = await resp.json().catch(() => ({}));
    return { resp, body };
  } catch (e) {
    console.log("guess submit failed", e);
    return { resp: { status: 0 }, body: {} };
  }
}
