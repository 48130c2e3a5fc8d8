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
    // returns the current one — resync and retry.
    let result;
    do {
      result = await submitDuelGuess(
        gameID,
        guess.results.lat,
        guess.results.lng,
        roundNumber,
        battleRoyale
      );
      roundNumber = (result.body.currentRoundNumber || roundNumber) + 1;
    } while (result.resp.status === 400);

    await reportGameResult(gameID, roundNumber - 1, result.body);
    await waitTillDisappears(guessButton);
  }
})();

async function submitDuelGuess(gameID, lat, lng, roundNumber, battleRoyale) {
  const mode = battleRoyale ? "battle-royale" : "duels";
  const apiURL = `https://game-server.geoguessr.com/api/${mode}/${gameID}/guess`;
  const resp = await fetch(apiURL, {
    method: "POST",
    credentials: "include",
    headers: { "Content-Type": "application/json", "x-client": "web" },
    body: JSON.stringify({ lat, lng, roundNumber }),
  });
  const body = await resp.json();
  return { resp, body };
}
