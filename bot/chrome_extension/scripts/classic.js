// Classic (single-player) game bot. The reference's classic.js only
// captured and displayed a screenshot — it never actually guessed
// (bot/chrome_extension/scripts/classic.js:1-17). This version
// completes the mode: single screenshot -> model server -> submit the
// guess through the public v3 game API, then report the result.
//
// Classic rounds show ONE street-view image, so start the model server
// WITHOUT --panorama (single-image tower).

(async () => {
  let lastToken = null;

  while (true) {
    await waitTillAppears(".guess-map__guess-button");
    await randomWait(1500, 5000);

    const gameToken = gameIdFromUrl();
    if (gameToken === lastToken) {
      await wait(500);
      continue;
    }

    const image = await captureSingle();

    let guess;
    try {
      guess = await requestPrediction(gameToken, 1, [image]);
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
    lastToken = gameToken;
    await reportGameResult(gameToken, result.round || 1, result);
    await waitTillDisappears(".guess-map__guess-button");
  }
})();

async function submitClassicGuess(token, lat, lng) {
  const resp = await fetch(`https://www.geoguessr.com/api/v3/games/${token}`, {
    method: "POST",
    credentials: "include",
    headers: { "Content-Type": "application/json", "x-client": "web" },
    body: JSON.stringify({ token, lat, lng, timedOut: false }),
  });
  return resp.json();
}
