# Container packaging parity with the reference's Dockerfile
# (/root/reference/Dockerfile:1-13: python base, copy, pip install,
# CMD app.py dev all). Spark needs a JVM, so the base image carries
# Java 17; the entrypoint is the engine's CLI twin of the reference's
# `python app.py dev all`.
FROM eclipse-temurin:17-jre-jammy

RUN apt-get update \
    && apt-get install -y --no-install-recommends python3 python3-pip \
    && rm -rf /var/lib/apt/lists/* \
    && ln -sf /usr/bin/python3 /usr/local/bin/python

WORKDIR /app

# Dependency layer first so code edits don't bust the pip cache
COPY pyproject.toml /app/
RUN pip install --no-cache-dir pyspark==4.1.2 pyarrow pandas numpy

COPY etl_data_pipeline_spark /app/etl_data_pipeline_spark
COPY __spark_entry__.py tables_list /app/

ENV SPARK_GRAFT_CPUS=4

CMD ["python", "-m", "etl_data_pipeline_spark", "dev", "all"]
