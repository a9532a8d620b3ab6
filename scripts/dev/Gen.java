import java.io.BufferedReader;
import java.io.InputStreamReader;
import java.io.OutputStreamWriter;
import java.io.PrintWriter;
import java.nio.charset.StandardCharsets;
import org.tartarus.snowball.SnowballStemmer;

/**
 * Behavioral-oracle driver: stems stdin words (one per line) with the
 * reference's own compiled Snowball stemmer and prints "word\tstem" pairs.
 * Used by scripts/dev/gen_snowball_vectors.py to produce the parity
 * archives the Python translations are validated against
 * (lucene_spark/analysis/data/snowball_*.tsv.gz).
 */
public class Gen {
  public static void main(String[] args) throws Exception {
    SnowballStemmer st =
        (SnowballStemmer)
            Class.forName("org.tartarus.snowball.ext." + args[0] + "Stemmer")
                .getDeclaredConstructor()
                .newInstance();
    BufferedReader in =
        new BufferedReader(new InputStreamReader(System.in, StandardCharsets.UTF_8));
    PrintWriter out = new PrintWriter(new OutputStreamWriter(System.out, StandardCharsets.UTF_8));
    String w;
    while ((w = in.readLine()) != null) {
      st.setCurrent(w);
      st.stem();
      out.println(w + "\t" + st.getCurrent());
    }
    out.flush();
  }
}
