package dk.aau.modelardb.core;

import dk.aau.modelardb.core.models.ModelType;
import dk.aau.modelardb.core.models.ModelTypeFactory;
import dk.aau.modelardb.core.timeseries.TimeSeries;
import dk.aau.modelardb.core.timeseries.TimeSeriesCSV;
import dk.aau.modelardb.core.utility.SegmentFunction;

import java.io.PrintWriter;
import java.util.ArrayList;
import java.util.List;
import java.util.function.Supplier;

/** Batch fuzz driver: one JVM runs MANY reference-engine cases (a fresh
 * TimeSeriesGroup + SegmentGenerator per case) so the differential fuzz
 * pytest pays JVM startup once for 100+ cases. Manifest line format:
 *   eb lengthBound si splitFraction maxLatency outPath seriesCsv1 [...]
 * Output rows per case (GroupHarness format; maxLatency > 0 interleaves
 * temporary T rows with finalized F rows):
 *   F,start,end,mtid,count,modelhex,gaps   (gaps ;-separated sorted tids)
 *   T,start,end,mtid,count,modelhex,gaps
 * Original harness code that merely drives the reference classes, like
 * GoldenHarness/GroupHarness. */
public class FuzzHarness {
    public static void main(String[] args) throws Exception {
        List<String> lines = java.nio.file.Files.readAllLines(
                java.nio.file.Paths.get(args[0]));
        for (String line : lines) {
            line = line.trim();
            if (!line.isEmpty()) runCase(line.split("\\s+"));
        }
    }

    private static void runCase(String[] a) throws Exception {
        float eb = Float.parseFloat(a[0]);
        int lengthBound = Integer.parseInt(a[1]);
        final int si = Integer.parseInt(a[2]);
        float splitFraction = Float.parseFloat(a[3]);
        int maximumLatency = Integer.parseInt(a[4]);
        String outPath = a[5];
        int nSeries = a.length - 6;
        TimeSeries[] tss = new TimeSeries[nSeries];
        List<Integer> tids = new ArrayList<>();
        for (int i = 0; i < nSeries; i++) {
            tss[i] = new TimeSeriesCSV(
                    a[6 + i], i + 1, si, ",", false, 0, "java", "UTC", 1, "en");
            tids.add(i + 1);
        }
        TimeSeriesGroup tsg = new TimeSeriesGroup(1, tss);
        tsg.initialize();
        String[] names = {
                "dk.aau.modelardb.core.models.PMC_MeanModelType",
                "dk.aau.modelardb.core.models.SwingFilterModelType",
                "dk.aau.modelardb.core.models.FacebookGorillaModelType"};
        int[] mtids = {2, 3, 4};
        Supplier<ModelType[]> init =
                () -> ModelTypeFactory.getModelTypes(names, mtids, eb, lengthBound);
        ModelType fallback = ModelTypeFactory.getFallbackModelType(eb, lengthBound);
        try (PrintWriter w = new PrintWriter(outPath)) {
            SegmentFunction temp = (gid, st, et, mtid, model, gaps) ->
                    emitRow(w, "T", si, st, et, mtid, model, gaps);
            SegmentFunction out = (gid, st, et, mtid, model, gaps) ->
                    emitRow(w, "F", si, st, et, mtid, model, gaps);
            SegmentGenerator sg = new SegmentGenerator(
                    tsg, init, fallback, tids, maximumLatency, splitFraction,
                    maximumLatency > 0 ? temp
                            : (gid, st, et, mtid, model, gaps) -> {},
                    out);
            sg.consumeAllDataPoints();
            sg.close();
        }
    }

    private static void emitRow(PrintWriter w, String kind, int si, long st,
                                long et, int mtid, byte[] model, byte[] gaps) {
        StringBuilder sb = new StringBuilder();
        for (byte b : model) sb.append(String.format("%02x", b));
        java.nio.IntBuffer ib = java.nio.ByteBuffer.wrap(gaps).asIntBuffer();
        int[] garr = new int[ib.remaining()];
        ib.get(garr);
        java.util.Arrays.sort(garr);
        StringBuilder gs = new StringBuilder();
        for (int g : garr) {
            if (gs.length() > 0) gs.append(';');
            gs.append(g);
        }
        long cnt = (et - st) / si + 1;
        w.println(kind + "," + st + "," + et + "," + mtid + "," + cnt + "," + sb
                + "," + gs);
    }
}
