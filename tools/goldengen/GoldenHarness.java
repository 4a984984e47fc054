package dk.aau.modelardb.core;

import dk.aau.modelardb.core.models.ModelType;
import dk.aau.modelardb.core.models.ModelTypeFactory;
import dk.aau.modelardb.core.timeseries.TimeSeries;
import dk.aau.modelardb.core.timeseries.TimeSeriesCSV;
import dk.aau.modelardb.core.utility.SegmentFunction;

import java.util.Arrays;
import java.util.function.Supplier;

/** Drives the reference SegmentGenerator over a (ms,value) CSV and prints
 * finalized segments as "start,end,mtid,count,modelhex" — used only to
 * regenerate tests/golden fixtures from the actual Java implementation. */
public class GoldenHarness {
    public static void main(String[] args) throws Exception {
        String input = args[0];
        float eb = Float.parseFloat(args[1]);
        int lengthBound = Integer.parseInt(args[2]);
        final int si = Integer.parseInt(args[3]);

        TimeSeriesCSV ts = new TimeSeriesCSV(
                input, 1, si, ",", false, 0, "java", "UTC", 1, "en");
        TimeSeriesGroup tsg = new TimeSeriesGroup(1, new TimeSeries[]{ts});
        tsg.initialize();
        String[] names = {
                "dk.aau.modelardb.core.models.PMC_MeanModelType",
                "dk.aau.modelardb.core.models.SwingFilterModelType",
                "dk.aau.modelardb.core.models.FacebookGorillaModelType"};
        int[] mtids = {2, 3, 4};
        Supplier<ModelType[]> init =
                () -> ModelTypeFactory.getModelTypes(names, mtids, eb, lengthBound);
        ModelType fallback = ModelTypeFactory.getFallbackModelType(eb, lengthBound);
        SegmentFunction drop = (gid, st, et, mtid, model, gaps) -> {};
        SegmentFunction out = (gid, st, et, mtid, model, gaps) -> {
            StringBuilder sb = new StringBuilder();
            for (byte b : model) sb.append(String.format("%02x", b));
            long cnt = (et - st) / si + 1;
            System.out.println(st + "," + et + "," + mtid + "," + cnt + "," + sb);
        };
        SegmentGenerator sg = new SegmentGenerator(
                tsg, init, fallback, Arrays.asList(1), 0, 10.0F, drop, out);
        sg.consumeAllDataPoints();
        sg.close();
    }
}
