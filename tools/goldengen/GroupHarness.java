package dk.aau.modelardb.core;

import dk.aau.modelardb.core.models.ModelType;
import dk.aau.modelardb.core.models.ModelTypeFactory;
import dk.aau.modelardb.core.timeseries.TimeSeries;
import dk.aau.modelardb.core.timeseries.TimeSeriesCSV;
import dk.aau.modelardb.core.utility.SegmentFunction;

import java.util.ArrayList;
import java.util.List;
import java.util.function.Supplier;

/** Drives the reference SegmentGenerator over a GROUP of (ms,value) CSVs
 * and prints finalized segments as "start,end,mtid,count,modelhex,gaps"
 * (gaps = ;-separated tids absent from the segment). Used only to generate
 * tests/golden_grouped fixtures from the actual Java implementation,
 * including its dynamic split/join behavior. */
public class GroupHarness {
    public static void main(String[] args) throws Exception {
        float eb = Float.parseFloat(args[0]);
        int lengthBound = Integer.parseInt(args[1]);
        final int si = Integer.parseInt(args[2]);
        float splitFraction = Float.parseFloat(args[3]);
        int maximumLatency = Integer.parseInt(args[4]);

        int nSeries = args.length - 5;
        TimeSeries[] tss = new TimeSeries[nSeries];
        List<Integer> tids = new ArrayList<>();
        for (int i = 0; i < nSeries; i++) {
            tss[i] = new TimeSeriesCSV(
                    args[5 + i], i + 1, si, ",", false, 0, "java", "UTC", 1, "en");
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
        SegmentFunction temp = (gid, st, et, mtid, model, gaps) ->
                emitRow("T", si, gid, st, et, mtid, model, gaps);
        SegmentFunction out = (gid, st, et, mtid, model, gaps) ->
                emitRow("F", si, gid, st, et, mtid, model, gaps);
        dummy(); if (false) {
        }
        SegmentGenerator sg = new SegmentGenerator(
                tsg, init, fallback, tids, maximumLatency, splitFraction, temp, out);
        sg.consumeAllDataPoints();
        sg.close();
    }

    private static void dummy() {}

    private static void emitRow(String kind, int si, int gid, long st, long et,
                                int mtid, byte[] model, byte[] gaps) {
        StringBuilder sb = new StringBuilder();
        for (byte b : model) sb.append(String.format("%02x", b));
        StringBuilder gs = new StringBuilder();
        java.nio.IntBuffer ib = java.nio.ByteBuffer.wrap(gaps).asIntBuffer();
        int[] garr = new int[ib.remaining()];
        ib.get(garr);
        java.util.Arrays.sort(garr);
        for (int g : garr) {
            if (gs.length() > 0) gs.append(';');
            gs.append(g);
        }
        long cnt = (et - st) / si + 1;
        System.out.println(kind + "," + st + "," + et + "," + mtid + "," + cnt + "," + sb + "," + gs);
    }
}
