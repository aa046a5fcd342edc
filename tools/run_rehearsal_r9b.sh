#!/bin/bash
cd /root/repo
AO=""; for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio java.util java.util.concurrent java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do AO="$AO --add-opens java.base/$p=ALL-UNNAMED"; done
for c in 25 100; do
  echo "=== copies=$c $(date) ==="
  java $AO -Xmx100g -cp "target/rehearsal-classes:/opt/spark/jars/*" graft.tools.ScaleRehearsal /root/testdata/sf0.1 $c 2>&1 | grep -vE "^2[0-9]|WARN|INFO"
done
echo "=== done $(date) ==="
