#!/usr/bin/env python3
"""spark-submit entry file (absolute imports — runnable as a plain script).

    cd /root/repo && zip -r /tmp/engine.zip pdf_ocr_batch_ndrocr_lite_spark
    spark-submit --py-files /tmp/engine.zip submit_extract.py \
        --input s3://bucket/pages --output out --checkpoint ckpt [--iceberg]

Locally: python submit_extract.py --synthetic-docs 2000 --output /tmp/out \
             --checkpoint /tmp/ckpt --master 'local[8]'
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pdf_ocr_batch_ndrocr_lite_spark.jobs import main

if __name__ == "__main__":
    sys.exit(main())
