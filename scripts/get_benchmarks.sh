#!/usr/bin/env bash
# Fetch the public geolocation benchmarks the reference registers
# (`dataset_creation/benchmark/benchmark_dataset.py:23-31`) and convert
# them to the pigeon_tpu registry schema (image,lng,lat CSV + jpg dir).
#
# Requires network access. gws15k and the GeoGuessr holdout are
# proprietary to the PIGEON authors and cannot be fetched.
set -euo pipefail

DEST="${1:-data/benchmarks}"
mkdir -p "$DEST"

# --- im2gps (Hays & Efros CVPR'08 test set, 237 geotagged photos) -------
# Ground truth is embedded in the download page's .mat; the zip filenames
# carry Flickr photo ids that join against the gt file.
IM2GPS_ZIP="http://graphics.cs.cmu.edu/projects/im2gps/gps_query_imgs.zip"
if [ ! -d "$DEST/im2gps/jpgs" ]; then
  mkdir -p "$DEST/im2gps/jpgs"
  curl -L --fail -o /tmp/im2gps.zip "$IM2GPS_ZIP"
  unzip -o -q /tmp/im2gps.zip -d "$DEST/im2gps/jpgs"
fi

# --- im2gps3k + yfcc4k (Vo et al., "Revisiting IM2GPS") ------------------
# Ground-truth lists ship in the authors' repo; images are fetched from
# Flickr by photo id. The lists give: <photo_id> <lat> <lon> ...
REVISIT_RAW="https://raw.githubusercontent.com/lugiavn/revisiting-im2gps/master"
for name in im2gps3k_places365 yfcc4k_places365; do
  curl -L --fail -o "/tmp/${name}.txt" "$REVISIT_RAW/${name}.txt" || \
    echo "WARN: could not fetch ${name}.txt (repo layout may have moved)"
done

python - "$DEST" <<'EOF'
"""Convert fetched ground-truth lists to the registry CSV schema."""
import csv, os, sys

dest = sys.argv[1]
for src, bench in (("/tmp/im2gps3k_places365.txt", "im2gps3k"),
                   ("/tmp/yfcc4k_places365.txt", "yfcc4k")):
    if not os.path.exists(src):
        continue
    os.makedirs(f"{dest}/{bench}/jpgs", exist_ok=True)
    rows = []
    with open(src) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 3:
                continue
            photo, lat, lon = parts[0], float(parts[1]), float(parts[2])
            img = photo if photo.endswith(".jpg") else photo + ".jpg"
            rows.append({"image": img, "lng": lon, "lat": lat})
    with open(f"{dest}/{bench}/{bench}_meta.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["image", "lng", "lat"])
        w.writeheader()
        w.writerows(rows)
    print(f"{bench}: {len(rows)} rows -> {dest}/{bench}/{bench}_meta.csv")
    print(f"  (download the jpgs into {dest}/{bench}/jpgs/ via the Flickr "
          f"ids; see the revisiting-im2gps README)")
EOF

echo "done — register paths are already in $DEST/benchmarks.json"
