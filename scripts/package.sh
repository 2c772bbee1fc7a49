#!/bin/sh
# Build didtool_spark.zip for spark-submit --py-files (north rule launch
# shape: spark-submit --py-files didtool_spark.zip job.py --master yarn/k8s)
cd "$(dirname "$0")/.." || exit 1
rm -f didtool_spark.zip
python -c "
import zipfile, os
with zipfile.ZipFile('didtool_spark.zip', 'w', zipfile.ZIP_DEFLATED) as z:
    for dp, _, fs in os.walk('didtool_spark'):
        for f in fs:
            if f.endswith('.py'):
                p = os.path.join(dp, f)
                z.write(p, p)
print('wrote didtool_spark.zip')
"
