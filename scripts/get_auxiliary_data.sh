#!/bin/sh
# Fetch the public auxiliary geo datasets the framework can consume
# (countries/admin boundaries, population, climate rasters).
#
# Counterpart of the reference's get_auxiliary_data.sh — same public
# sources, targeting this framework's expected paths. Run from the repo
# root on a machine with network access; every consumer degrades
# gracefully when a file is absent.
set -e
mkdir -p data/boundaries data/pop_density data/koppen_geiger

# geoBoundaries CGAZ admin boundaries (ADM0/1/2) as GeoJSON
for LEVEL in ADM0 ADM1 ADM2; do
  curl -L -o "data/boundaries/geoBoundariesCGAZ_${LEVEL}.geojson" \
    "https://github.com/wmgeolab/geoBoundaries/raw/main/releaseData/CGAZ/geoBoundariesCGAZ_${LEVEL}.geojson"
done

# GHSL population density raster (Mollweide, 1 km)
curl -L -o data/pop_density/ghsl_pop_2020.zip \
  "https://jeodpp.jrc.ec.europa.eu/ftp/jrc-opendata/GHSL/GHS_POP_GLOBE_R2022A/GHS_POP_E2020_GLOBE_R2022A_54009_1000/V1-0/GHS_POP_E2020_GLOBE_R2022A_54009_1000_V1_0.zip"
unzip -o data/pop_density/ghsl_pop_2020.zip -d data/pop_density

# Beck et al. Koppen-Geiger climate classification raster
curl -L -o data/koppen_geiger/koppen_geiger.zip \
  "https://figshare.com/ndownloader/files/12407516"
unzip -o data/koppen_geiger/koppen_geiger.zip -d data/koppen_geiger

echo "auxiliary data ready under data/"
