# Container packaging parity with the reference's Dockerfile
# (/root/reference/Dockerfile:1-13: python base, copy, pip install,
# CMD app.py dev all). Spark needs a JVM, so the base image carries
# Java 17; the entrypoint is the engine's CLI twin of the reference's
# `python app.py dev all`.
#
# Run with the source data mounted and pointed at by env:
#   docker run -v /path/to/tables:/data/source \
#              -e SOURCE_DB_PATH=/data/source <image>
# (dev-env config reads SOURCE_DB_PATH / TARGET_DB_PATH, config.py;
# without the mount the default source path does not exist in the
# container and every table load fails by design, not silently.)
FROM eclipse-temurin:17-jre-jammy

RUN apt-get update \
    && apt-get install -y --no-install-recommends python3 python3-pip \
    && rm -rf /var/lib/apt/lists/* \
    && ln -sf /usr/bin/python3 /usr/local/bin/python

WORKDIR /app

# Runtime deps only, pinned here on purpose: pyproject.toml's dev/test
# extras (duckdb, pytest, hypothesis) don't belong in the image, and a
# COPY of pyproject would bust this cache layer without changing what
# gets installed.
RUN pip install --no-cache-dir pyspark==4.1.2 pyarrow pandas numpy

COPY etl_data_pipeline_spark /app/etl_data_pipeline_spark
COPY __spark_entry__.py tables_list /app/

ENV SPARK_GRAFT_CPUS=4 \
    SOURCE_DB_PATH=/data/source \
    TARGET_DB_PATH=/data/target

VOLUME ["/data"]

CMD ["python", "-m", "etl_data_pipeline_spark", "dev", "all"]
